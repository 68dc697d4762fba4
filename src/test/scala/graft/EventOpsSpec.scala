package graft

import graft.ops.EventOps

/** Value-level verification of the event-sequence analytics (funnel, cohort
  * retention) on hand-computable fixtures; the declared queries are
  * additionally DuckDB-oracle-checked by the driver.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, type) — user 1 completes the full funnel in order; user 2
  // performs step 2 BEFORE step 1 (must not count) and again after; user 3
  // stops after step 1; user 4 never enters (no signup)
  private def events = Seq(
    (1L, 100L, "signup"), (1L, 200L, "click"), (1L, 300L, "purchase"),
    (2L, 50L, "click"), (2L, 150L, "signup"), (2L, 250L, "click"),
    (3L, 10L, "signup"), (3L, 5L, "purchase"), // purchase precedes: no click
    (4L, 999L, "click")
  ).toDF("user_id", "ts", "event_type")

  test("funnel: strict step ordering, nulls after progression stops") {
    val r = EventOps.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((Option(x.get(1)), Option(x.get(2)), Option(x.get(3))),
          x.getAs[Long]("n_steps"))).toMap
    assert(r.keySet == Set(1L, 2L, 3L)) // user 4 never signed up
    assert(r(1L) == (((Some(100L), Some(200L), Some(300L)), 3L)))
    // user 2's pre-signup click is ignored; the later one counts
    assert(r(2L) == (((Some(150L), Some(250L), None), 2L)))
    // user 3's purchase precedes signup — funnel stops at step 1
    assert(r(3L) == (((Some(10L), None, None), 1L)))
  }

  test("funnel: ties are strict (same-timestamp next step does not count)") {
    val tied = Seq((1L, 100L, "signup"), (1L, 100L, "click"))
      .toDF("user_id", "ts", "event_type")
    val r = EventOps.funnel(tied, "user_id", "ts", "event_type",
      Seq("signup", "click")).head()
    assert(r.isNullAt(r.fieldIndex("t_2")))
    assert(r.getAs[Long]("n_steps") == 1L)
  }

  test("funnel: maxGap enforces the conversion window") {
    // user 1 clicks 100 units after signup; gap 50 rejects, gap 100 admits
    val ev = Seq((1L, 0L, "signup"), (1L, 100L, "click"))
      .toDF("user_id", "ts", "event_type")
    val tight = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "click"), maxGap = Some(50L)).head()
    assert(tight.isNullAt(tight.fieldIndex("t_2")))
    val wide = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "click"), maxGap = Some(100L)).head()
    assert(wide.getAs[Long]("t_2") == 100L)
  }

  test("funnel matches a driver-side reference fold on random data (fuzz)") {
    // anchored-first semantics, with and without the conversion window:
    // t_k = earliest event of steps(k) strictly after t_{k-1} (and within
    // maxGap of it). The reference fold recomputes that directly from the
    // sorted per-entity timeline.
    val rnd = new scala.util.Random(7)
    val types = Vector("signup", "click", "purchase", "view")
    val steps = Seq("signup", "click", "purchase")
    def reference(evs: Seq[(Long, Long, String)], gap: Option[Long]) =
      evs.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(_._2)
        val times = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.foreach { case (_, t, ty) =>
          val k = times.length
          if (k < steps.length && ty == steps(k) &&
            times.lastOption.forall(p => t > p && gap.forall(g => t <= p + g)))
            times += t
        }
        if (times.isEmpty) None else Some(u -> times.toList)
      }
    for (gap <- Seq(None, Some(40L), Some(120L))) {
      val evs = (0 until 150).map(i =>
        (rnd.nextInt(6).toLong, i.toLong * 7, types(rnd.nextInt(types.length))))
      val got = EventOps.funnel(evs.toDF("user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", steps, maxGap = gap)
        .collect()
        .map { r =>
          r.getLong(0) -> (1 to 3).flatMap(k =>
            if (r.isNullAt(k)) None else Some(r.getLong(k))).toList
        }.toMap
      assert(got == reference(evs, gap), s"gap=$gap diverged")
    }
  }

  test("any-anchor funnel finds the re-entrant conversion anchored-first misses") {
    // first signup's window (gap 100) expires before the click; the second
    // signup's chain completes. Anchored-first: n_steps = 1. Any-anchor:
    // the anchor-2 chain (200, 250, 280) wins.
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 200L, "signup"),
      (1L, 250L, "click"), (1L, 280L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq("signup", "click", "purchase")
    val first = EventOps.funnel(ev, "user_id", "ts", "event_type",
      steps, maxGap = Some(100L)).head()
    assert(first.getAs[Long]("n_steps") == 1L)
    val any = EventOps.funnelAnyAnchor(ev, "user_id", "ts", "event_type",
      steps, maxGap = Some(100L), maxAnchors = 3).head()
    assert(any.getAs[Long]("n_steps") == 3L)
    assert((any.getLong(1), any.getLong(2), any.getLong(3)) ==
      ((200L, 250L, 280L)))
  }

  test("any-anchor funnel's maxAnchors is a real bound (documented recall trade)") {
    // only the THIRD signup's chain completes; m = 2 must miss it, m = 3
    // must find it
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 10L, "signup"), (1L, 500L, "signup"),
      (1L, 510L, "click"), (1L, 520L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq("signup", "click", "purchase")
    def run(m: Int) = EventOps.funnelAnyAnchor(ev, "user_id", "ts",
      "event_type", steps, maxGap = Some(50L), maxAnchors = m)
      .head().getAs[Long]("n_steps")
    assert(run(2) == 1L)
    assert(run(3) == 3L)
  }

  test("any-anchor funnel: duplicate anchor timestamps yield one deterministic row") {
    // two signups at the SAME ts: the anchor-index assignment between them
    // is tie-arbitrary, but both chains are value-identical, so the best-
    // chain output must be the same single row either way
    val ev = Seq(
      (1L, 100L, "signup"), (1L, 100L, "signup"),
      (1L, 150L, "click"), (1L, 180L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = EventOps.funnelAnyAnchor(ev, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"), maxGap = Some(100L),
      maxAnchors = 2).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getAs[Long]("n_steps")) == ((100L, 150L, 180L, 3L)))
  }

  test("any-anchor funnel matches a driver-side reference fold on random data (fuzz)") {
    // reference: per entity, greedy chain from each of the earliest m
    // step-1 events; best chain by (n_steps desc, t1 asc)
    val rnd = new scala.util.Random(19)
    val types = Vector("signup", "click", "purchase", "view")
    val steps = Seq("signup", "click", "purchase")
    def chain(sorted: Seq[(Long, String)], t1: Long,
        gap: Option[Long]): List[Long] = {
      val times = scala.collection.mutable.ArrayBuffer(t1)
      steps.tail.foreach { st =>
        val prev = times.last
        // only extend while progression is unbroken
        if (times.length == steps.indexOf(st)) {
          sorted.collectFirst {
            case (t, ty) if ty == st && t > prev &&
              gap.forall(g => t <= prev + g) => t
          }.foreach(times += _)
        }
      }
      times.toList
    }
    def reference(evs: Seq[(Long, Long, String)], gap: Option[Long], m: Int) =
      evs.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.map(e => (e._2, e._3)).sortBy(_._1)
        val anchors = sorted.collect { case (t, "signup") => t }.take(m)
        if (anchors.isEmpty) None
        else {
          val chains = anchors.map(a => chain(sorted, a, gap))
          Some(u -> chains.maxBy(c => (c.length, -c.head)))
        }
      }
    for (gap <- Seq(None, Some(40L), Some(120L)); m <- Seq(1, 2, 4)) {
      val evs = (0 until 200).map(i =>
        (rnd.nextInt(6).toLong, i.toLong * 7, types(rnd.nextInt(types.length))))
      val got = EventOps.funnelAnyAnchor(
          evs.toDF("user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", steps, maxGap = gap, maxAnchors = m)
        .collect()
        .map { r =>
          r.getLong(0) -> (1 to 3).flatMap(k =>
            if (r.isNullAt(k)) None else Some(r.getLong(k))).toList
        }.toMap
      assert(got == reference(evs, gap, m), s"gap=$gap m=$m diverged")
      // m = 1 degenerates to anchored-first exactly
      if (m == 1) {
        val af = EventOps.funnel(evs.toDF("user_id", "ts", "event_type"),
            "user_id", "ts", "event_type", steps, maxGap = gap)
          .collect()
          .map { r =>
            r.getLong(0) -> (1 to 3).flatMap(k =>
              if (r.isNullAt(k)) None else Some(r.getLong(k))).toList
          }.toMap
        assert(got == af, s"gap=$gap m=1 != anchored-first")
      }
    }
  }

  test("cohort retention counts distinct actives per (cohort, offset)") {
    // bucket width 100: user 1 first in bucket 0, active in 0 and 2;
    // user 2 first in bucket 0, active in 0 twice (distinct-counted once);
    // user 3 first in bucket 1, active in 1 and 2
    val ev = Seq(
      (1L, 10L), (1L, 250L),
      (2L, 20L), (2L, 30L),
      (3L, 110L), (3L, 290L)
    ).toDF("user_id", "ts")
    val r = EventOps.cohortRetention(ev, "user_id", "ts", width = 100L)
      .collect()
      .map(x => (x.getAs[Long]("cohort"), x.getAs[Long]("offset")) ->
        x.getAs[Long]("n_active")).toMap
    assert(r == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("path ngrams count consecutive type runs per entity") {
    // user 1: a>b>c, b>c>a; user 2: a>b>c — runs never cross entities
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c")
    ).toDF("user_id", "ts", "event_type")
    val r = EventOps.pathNgrams(ev, "user_id", "ts", "event_type", n = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a>b>c" -> 2L, "b>c>a" -> 1L))
  }

  test("cohort buckets are exact for nanosecond-scale timestamps") {
    // ts magnitudes ~1.7e18 exceed double's 2^53 integer range: a double
    // divide rounds k*width - 1 UP to the k*width boundary and misbuckets.
    // The integer `div` path must put it in bucket k-1.
    val width = 86400000000000L // one day in ns
    val k = 20000L
    val ev = Seq((1L, k * width - 1), (1L, k * width))
      .toDF("user_id", "ts")
    val r = EventOps.cohortRetention(ev, "user_id", "ts", width)
      .collect()
      .map(x => (x.getAs[Long]("cohort"), x.getAs[Long]("offset")) ->
        x.getAs[Long]("n_active")).toMap
    assert(r == Map((k - 1, 0L) -> 1L, (k - 1, 1L) -> 1L))
  }
}
