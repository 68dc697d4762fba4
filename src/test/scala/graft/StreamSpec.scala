package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.EventStream
import graft.stream.EventStream.{HeadObservation, HeaderAction}

/** Structured-Streaming behaviors (SURVEY.md §2.8): tumbling/session
  * windows, watermark dedup, and the reorg tail end-to-end through
  * `flatMapGroupsWithState` on a real streaming query.
  *
  * Append-mode windowed aggs only emit once the watermark passes the window
  * end, and the watermark advances between micro-batches — so each test
  * feeds data across several `processAllAvailable()` rounds, with a final
  * far-future event pushing the watermark past everything under test.
  */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("tumbling window agg over a memory stream") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF.toDF("ts", "event_type", "value")
    val q = EventStream.tumblingAgg(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    in.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0),
      (ts(11), "click", 4.0))
    q.processAllAvailable()
    in.addData((ts(40), "view", 8.0)) // watermark → 10:35 after this batch
    q.processAllAvailable()
    in.addData((ts(59), "view", 1.0)) // next batch runs with wm 10:35
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumbling")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:10:00.0", "click", 1L, 4.0)))
  }

  test("streaming dedup within watermark drops the duplicate") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF.toDF("event_id", "ts")
    val q = EventStream.dedupWithinWatermark(events, "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    in.addData((1L, ts(1)), (1L, ts(2)), (2L, ts(3)))
    q.processAllAvailable()
    in.addData((1L, ts(4))) // still within the watermark → dropped
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("streaming funnel matches the batch funnel on an in-order replay") {
    implicit val sql = spark.sqlContext
    import graft.stream.EventStream.FunnelEvent
    val in = MemoryStream[FunnelEvent]
    val q = EventStream.funnelTail(in.toDS(),
        Seq("signup", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    // batch 1: user 1 signs up then clicks; user 2's click precedes signup
    in.addData(FunnelEvent(1L, 100L, "signup"), FunnelEvent(1L, 200L, "click"),
      FunnelEvent(2L, 50L, "click"), FunnelEvent(2L, 150L, "signup"))
    q.processAllAvailable()
    // batch 2: user 1 completes (state evicted); user 2 clicks post-signup
    in.addData(FunnelEvent(1L, 300L, "purchase"),
      FunnelEvent(2L, 250L, "click"))
    q.processAllAvailable()
    // batch 3: a SECOND purchase by user 1 is ignored (post-completion,
    // not a first step); user 1 RE-ENTERS cross-batch via a new signup;
    // user 2 completes and re-enters WITHIN the same batch — both re-entry
    // paths must behave identically (the completion reset is batch-
    // boundary-independent)
    in.addData(FunnelEvent(1L, 400L, "purchase"), FunnelEvent(1L, 500L, "signup"),
      FunnelEvent(2L, 300L, "purchase"), FunnelEvent(2L, 350L, "signup"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val firstCompletions = Set((1L, 1, 100L), (1L, 2, 200L), (1L, 3, 300L),
      (2L, 1, 150L), (2L, 2, 250L), (2L, 3, 300L))
    val reEntries = Set((1L, 1, 500L), (2L, 1, 350L))
    assert(got == firstCompletions ++ reEntries)
    // cross-check: the batch operator (first conversions only) on the same
    // replay produces exactly the first-completion rows
    val ev = Seq((1L, 100L, "signup"), (1L, 200L, "click"),
      (2L, 50L, "click"), (2L, 150L, "signup"), (1L, 300L, "purchase"),
      (2L, 250L, "click"), (1L, 400L, "purchase"), (1L, 500L, "signup"),
      (2L, 300L, "purchase"), (2L, 350L, "signup"))
      .toDF("user_id", "ts", "event_type")
    val batch = graft.ops.EventOps.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase")).collect()
      .flatMap { r =>
        (1 to 3).flatMap(k => if (r.isNullAt(k)) None
          else Some((r.getLong(0), k, r.getLong(k))))
      }.toSet
    assert(batch == firstCompletions)
  }

  test("streaming funnel evicts stalled entities on idle timeout") {
    import graft.stream.EventStream.{FunnelEvent, FunnelState}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val fn = EventStream.funnelAdvance(Seq("signup", "click"),
      maxGap = None, idleTimeout = Some("200 milliseconds")) _
    // a first event creates state and arms the timeout
    val s1 = TestGroupState.create[FunnelState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val out1 = fn(1L, Iterator(FunnelEvent(1L, 100L, "signup")), s1).toSeq
    assert(out1.map(p => (p.step, p.ts)) == Seq((1, 100L)))
    assert(s1.get.times == List(100L))
    assert(s1.getTimeoutTimestampMs.isPresent) // idle timeout is armed
    // the timeout fires: state is removed, nothing emitted
    val s2 = TestGroupState.create[FunnelState](
      Optional.of(FunnelState(List(100L))),
      GroupStateTimeout.ProcessingTimeTimeout, batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = true)
    assert(fn(1L, Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved)
    // the entity re-appears after eviction: a fresh funnel from step 1
    val s3 = TestGroupState.create[FunnelState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, batchProcessingTimeMs = 3000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val out3 = fn(1L, Iterator(FunnelEvent(1L, 900L, "signup")), s3).toSeq
    assert(out3.map(p => (p.step, p.ts)) == Seq((1, 900L)))
  }

  test("funnel output is invariant to micro-batch boundaries (fuzz)") {
    // THE property both review rounds found bugs against: the same
    // event-time-ordered replay must emit the same progress rows no
    // matter where the micro-batch boundaries fall. Random event streams,
    // random contiguous splits, compared against the single-batch run;
    // first-completion rows additionally cross-checked vs the batch
    // operator.
    implicit val sql = spark.sqlContext
    import graft.stream.EventStream.FunnelEvent
    val rnd = new scala.util.Random(42)
    val types = Vector("signup", "click", "purchase", "view")
    val steps = Seq("signup", "click", "purchase")
    def run(events: Seq[FunnelEvent], splits: Seq[Int], name: String) = {
      val in = MemoryStream[FunnelEvent]
      val q = EventStream.funnelTail(in.toDS(), steps)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val batches = splits.zip(splits.tail :+ events.length).map {
        case (a, b) => events.slice(a, b)
      }
      batches.filter(_.nonEmpty).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      q.stop()
      // MULTISET compare (sorted seq, not a set): a duplicate emission of
      // the same progress row must fail the property, not vanish
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    }
    for (round <- 0 until 3) {
      // per-entity event-time-ordered stream (the cross-batch contract)
      val events = (0 until 120).map { i =>
        FunnelEvent(rnd.nextInt(5).toLong, i.toLong * 10,
          types(rnd.nextInt(types.length)))
      }
      val cuts = (0 +: Seq.fill(rnd.nextInt(6) + 2)(rnd.nextInt(events.length)))
        .distinct.sorted
      val whole = run(events, Seq(0), s"fz_whole_$round")
      val split = run(events, cuts, s"fz_split_$round")
      assert(split == whole, s"round $round: split-batch output diverged")
      // batch operator agrees on every entity's FIRST completion sequence
      val ev = events.map(e => (e.entity, e.ts, e.eventType))
        .toDF("user_id", "ts", "event_type")
      val batchRows = graft.ops.EventOps.funnel(ev, "user_id", "ts",
          "event_type", steps).collect()
        .flatMap { r =>
          (1 to 3).flatMap(k => if (r.isNullAt(k)) None
            else Some((r.getLong(0), k, r.getLong(k))))
        }.toSet
      assert(batchRows.subsetOf(whole.toSet),
        s"round $round: batch first-completions missing from stream output")
    }
  }

  test("any-anchor streaming funnel emits the re-entrant conversion the anchored form misses") {
    import graft.stream.EventStream.{FunnelAnyState, FunnelEvent, FunnelState}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val steps = Seq("signup", "click", "purchase")
    val events = Seq(
      FunnelEvent(1L, 0L, "signup"), FunnelEvent(1L, 200L, "signup"),
      FunnelEvent(1L, 250L, "click"), FunnelEvent(1L, 280L, "purchase"))
    // anchored-first: the t=0 anchor's window (gap 100) expires — only the
    // step-1 row ever emits
    val anchored = TestGroupState.create[FunnelState](Optional.empty(),
      GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val outA = EventStream.funnelAdvance(steps, Some(100L), None)(
      1L, events.iterator, anchored).toSeq
    assert(outA.map(p => (p.step, p.ts)) == Seq((1, 0L)))
    // any-anchor: the t=200 anchor's chain completes
    val any = TestGroupState.create[FunnelAnyState](Optional.empty(),
      GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val outB = EventStream.funnelAnyAdvance(steps, Some(100L), 2, None)(
      1L, events.iterator, any).toSeq
    assert(outB.map(p => (p.step, p.ts)) == Seq((1, 0L), (2, 250L), (3, 280L)))
    assert(any.isRemoved) // completion clears the bounded chain state
    // anchor slots are a real bound: m = 1 keeps only the expired anchor
    val one = TestGroupState.create[FunnelAnyState](Optional.empty(),
      GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val outC = EventStream.funnelAnyAdvance(steps, Some(100L), 1, None)(
      1L, events.iterator, one).toSeq
    assert(outC.map(p => (p.step, p.ts)) == Seq((1, 0L)))
  }

  test("any-anchor streaming funnel is invariant to micro-batch boundaries (fuzz)") {
    // same harness as the anchored fuzz; additionally, every entity's max
    // emitted depth must equal the batch funnelAnyAnchor's n_steps (the
    // two operators run the same first-m chain set)
    implicit val sql = spark.sqlContext
    import graft.stream.EventStream.FunnelEvent
    val rnd = new scala.util.Random(77)
    val types = Vector("signup", "click", "purchase", "view")
    val steps = Seq("signup", "click", "purchase")
    val m = 3
    val gap = Some(400L)
    def run(events: Seq[FunnelEvent], splits: Seq[Int], name: String) = {
      val in = MemoryStream[FunnelEvent]
      val q = EventStream.funnelAnyTail(in.toDS(), steps, gap, m)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val batches = splits.zip(splits.tail :+ events.length).map {
        case (a, b) => events.slice(a, b)
      }
      batches.filter(_.nonEmpty).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    }
    for (round <- 0 until 3) {
      val events = (0 until 120).map { i =>
        FunnelEvent(rnd.nextInt(5).toLong, i.toLong * 10,
          types(rnd.nextInt(types.length)))
      }
      val cuts = (0 +: Seq.fill(rnd.nextInt(6) + 2)(rnd.nextInt(events.length)))
        .distinct.sorted
      val whole = run(events, Seq(0), s"fza_whole_$round")
      val split = run(events, cuts, s"fza_split_$round")
      assert(split == whole, s"round $round: split-batch output diverged")
      val streamMax = whole.groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(_._2).max.toLong }
      val ev = events.map(e => (e.entity, e.ts, e.eventType))
        .toDF("user_id", "ts", "event_type")
      val batchMax = graft.ops.EventOps.funnelAnyAnchor(ev, "user_id", "ts",
          "event_type", steps, maxGap = gap, maxAnchors = m).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("n_steps")).toMap
      assert(streamMax == batchMax,
        s"round $round: stream max depth != batch n_steps")
    }
  }

  test("funnel completion followed by a non-entry event still clears state") {
    // regression: complete the funnel and, in the SAME batch, see one more
    // event that is NOT a step-1 re-entry. The in-loop reset empties the
    // working times; state must be REMOVED, not silently left at its
    // pre-completion value — a later final-step event would otherwise
    // re-fire the funnel with no intervening re-entry.
    import graft.stream.EventStream.{FunnelEvent, FunnelState}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val fn = EventStream.funnelAdvance(Seq("signup", "click", "purchase"),
      maxGap = None, idleTimeout = None) _
    val s = TestGroupState.create[FunnelState](
      Optional.of(FunnelState(List(100L, 200L))), // signup+click from before
      GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val out = fn(1L, Iterator(FunnelEvent(1L, 300L, "purchase"),
      FunnelEvent(1L, 400L, "click")), s).toSeq
    assert(out.map(p => (p.step, p.ts)) == Seq((3, 300L))) // click ignored
    assert(s.isRemoved) // stale [100,200] must not survive the batch
    // and a later purchase on fresh state emits nothing
    val s2 = TestGroupState.create[FunnelState](Optional.empty(),
      GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    assert(fn(1L, Iterator(FunnelEvent(1L, 500L, "purchase")), s2).isEmpty)
  }

  test("reorg tail end-to-end: fork retracts then applies (T4)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[HeadObservation]
    val q = EventStream.reorgTail(in.toDS(), maxBacklog = 10)
      .writeStream.format("memory").queryName("tail")
      .outputMode("append").start()
    def h(n: Long, tag: String, p: String) =
      HeadObservation("f", n, s"h$tag", s"h$p")
    // canonical 1..3
    in.addData(h(1, "1", "0"), h(2, "2", "1"), h(3, "3", "2"))
    q.processAllAvailable()
    // fork at height 2: 20←1, 30←20
    in.addData(h(2, "20", "1"), h(3, "30", "20"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tail").as[HeaderAction].collect().toSeq
    val expected = Seq(
      HeaderAction("f", "add", 1, "h1"),
      HeaderAction("f", "add", 2, "h2"),
      HeaderAction("f", "add", 3, "h3"),
      HeaderAction("f", "del", 2, "h2"),
      HeaderAction("f", "del", 3, "h3"),
      HeaderAction("f", "add", 2, "h20"),
      HeaderAction("f", "add", 3, "h30"))
    assert(out == expected)
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sql = spark.sqlContext
    val lin = MemoryStream[(Long, Timestamp)]
    val rin = MemoryStream[(Long, Timestamp)]
    val left = lin.toDF.toDF("user_id", "ts")
    val right = rin.toDF.toDF("user_id", "ts")
    val q = EventStream.intervalJoin(left, right, "user_id",
        watermark = "10 minutes", lower = "0 minutes", upper = "5 minutes")
      .writeStream.format("memory").queryName("ijoin")
      .outputMode("append").start()
    lin.addData((1L, ts(10)), (2L, ts(10)))
    rin.addData((1L, ts(12)), (1L, ts(20)), (2L, ts(30)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ijoin").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString)).toSet
    // only (1, 10:12) lands inside its left event's [10:10, 10:15] window
    assert(rows == Set((1L, "2024-01-01 10:10:00.0",
      "2024-01-01 10:12:00.0")))
  }

  test("session window groups by gap") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF.toDF("ts", "user_id")
    val q = EventStream.sessionAgg(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: events at 10:01,10:03 (one session), 10:20 (another)
    in.addData((ts(1), 1L), (ts(3), 1L), (ts(20), 1L))
    q.processAllAvailable()
    in.addData((ts(50), 2L)) // watermark → 10:40 after this batch
    q.processAllAvailable()
    in.addData((ts(59), 2L)) // batch evaluated with wm 10:40
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(rows.count(_._1 == 1L) == 2)
    assert(rows.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1L, 2L))
  }
}
