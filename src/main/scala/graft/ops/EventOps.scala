package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the tracked log/event table — the
  * behavioral-query layer a reference user runs against the store the
  * tracker fills (the reference externalizes all querying to its stores,
  * `store/postgresql/postgresql_store.go:226-239`; these are the standard
  * product-analytics shapes over that table).
  *
  * Scale discipline: every operator here shuffles on the entity key ONLY —
  * per-entity state is a fixed number of timestamps (funnel) or one
  * timestamp (cohort), never a collected event list, so state per key is
  * O(steps), not O(events). Consecutive joins share the entity-key
  * partitioning, so AQE plans them shuffle-reuse; nothing is collected to
  * the driver.
  */
object EventOps {

  /** Ordered funnel: for each entity, the earliest time it completed each
    * step, where step k must occur STRICTLY AFTER the entity's step-k−1
    * completion (the standard "signup → click → purchase" progression).
    * Entities that never performed `steps.head` are not in the funnel;
    * later steps are null once progression stops.
    *
    * Plan: one filtered min-aggregate per step — step k's aggregate joins
    * events (filtered to step k's type) against the step-k−1 completion
    * times, all keyed on the entity. No windows, no per-entity event
    * collection; cost is `steps.length` co-partitioned shuffles over
    * progressively smaller frames.
    *
    * @param steps  event-type values in funnel order (≥ 1)
    * @param maxGap when set, step k must also fall within `maxGap` time
    *               units of step k−1 (the conversion window: "purchase
    *               within 7 days of signup"). Semantics are ANCHORED-FIRST:
    *               each step's completion is the earliest qualifying event
    *               after the PREVIOUS completion, with t_1 = the entity's
    *               first step-1 event. A chain that would only complete
    *               when anchored at a LATER step-1 occurrence is not
    *               counted — deliberate: any-anchor semantics need every
    *               step-1 timestamp retained per entity (unbounded state),
    *               while this form keeps one timestamp per step and is
    *               deterministic for the oracle
    * @return (entityCol, t_1 .. t_n, n_steps) — t_k = min completion time
    *         of step k (null if never reached), n_steps = deepest step
    *         completed, 1..n
    */
  def funnel(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGap.forall(_ > 0), s"maxGap must be positive, got $maxGap")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("t_1"))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      // each iteration consumes acc TWICE (the step filter's join build and
      // the left join below); without materialization the acc subtree
      // doubles per step — 2^steps scans for a deep funnel. The lazy local
      // checkpoint collapses it to one small per-entity RDD per step, so
      // the corpus is scanned exactly once per step (pushed-filtered to
      // that step's type).
      val accM = acc.localCheckpoint(false)
      val inWindow = maxGap.map(g => col(tsCol) <= col(prev) + g)
        .getOrElse(lit(true))
      val stepMin = events.where(col(typeCol) === st)
        .join(accM.select(col(entityCol), col(prev)), Seq(entityCol))
        .where(col(tsCol) > col(prev) && inWindow)
        .groupBy(col(entityCol))
        .agg(min(col(tsCol)).as(cur))
      acc = accM.join(stepMin, Seq(entityCol), "left")
    }
    val nSteps = (2 to steps.length).foldLeft(lit(1L)) { (n, k) =>
      n + when(col(s"t_$k").isNotNull, 1L).otherwise(0L)
    }
    acc.withColumn("n_steps", nSteps)
  }

  /** Any-anchor funnel: like [[funnel]], but an entity's chain may start at
    * ANY of its earliest `maxAnchors` step-1 events, not only the first —
    * the re-entrant-user fix for conversion windows. Under anchored-first
    * semantics a user whose first signup expires the `maxGap` window but
    * who re-enters and then converts reads as n_steps = 1; here the
    * re-entry's chain is evaluated too and the best chain wins.
    *
    * BOUNDED STATE, by construction: only the earliest `maxAnchors` step-1
    * timestamps per entity are considered (the documented bound — a
    * conversion whose successful anchor is beyond the m-th step-1 event is
    * still missed; raise `maxAnchors` to trade memory for recall). The
    * streaming twin would keep a sliding window of the LAST m anchors; the
    * batch form keeps the FIRST m so results are deterministic and
    * oracle-checkable.
    *
    * Plan: one entity-key window ranks the anchors (row_number ≤ m), then
    * the same per-step filtered min-aggregates as [[funnel]] keyed on
    * (entity, anchor) — per-entity state is m × steps timestamps, never an
    * event list; each step's join fans events out at most m-fold. The
    * closing best-chain pick is a window over ≤ m rows per entity.
    *
    * Chain choice is deterministic in VALUES: max n_steps, then smallest
    * t_1 — two anchors with identical (n_steps, t_1) necessarily carry
    * identical chains, so the emitted row is unique even when the anchor
    * INDEX assignment between equal timestamps is not.
    *
    * @return (entityCol, t_1 .. t_n, n_steps) — same shape as [[funnel]]
    */
  def funnelAnyAnchor(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], maxGap: Option[Long] = None,
      maxAnchors: Int = 4): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGap.forall(_ > 0), s"maxGap must be positive, got $maxGap")
    require(maxAnchors >= 1, s"maxAnchors must be >= 1, got $maxAnchors")
    val aw = Window.partitionBy(col(entityCol)).orderBy(col("t_1"))
    var acc = events.where(col(typeCol) === steps.head)
      .select(col(entityCol), col(tsCol).as("t_1"))
      .withColumn("__anchor", row_number().over(aw))
      .where(col("__anchor") <= maxAnchors)
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      // same double-consumption shape as funnel — checkpoint per step
      val accM = acc.localCheckpoint(false)
      val inWindow = maxGap.map(g => col(tsCol) <= col(prev) + g)
        .getOrElse(lit(true))
      val stepMin = events.where(col(typeCol) === st)
        .join(accM.select(col(entityCol), col("__anchor"), col(prev)),
          Seq(entityCol))
        .where(col(tsCol) > col(prev) && inWindow)
        .groupBy(col(entityCol), col("__anchor"))
        .agg(min(col(tsCol)).as(cur))
      acc = accM.join(stepMin, Seq(entityCol, "__anchor"), "left")
    }
    val nSteps = (2 to steps.length).foldLeft(lit(1L)) { (n, k) =>
      n + when(col(s"t_$k").isNotNull, 1L).otherwise(0L)
    }
    val best = Window.partitionBy(col(entityCol))
      .orderBy(col("n_steps").desc, col("t_1"))
    acc.withColumn("n_steps", nSteps)
      .withColumn("__rk", row_number().over(best))
      .where(col("__rk") === 1)
      .drop("__rk", "__anchor")
  }

  /** Cohort retention: entities are grouped by the time-bucket of their
    * FIRST event (the cohort); for each (cohort, bucket-offset) the number
    * of distinct entities active in that bucket. The classic retention
    * triangle, on integer bucket arithmetic so any engine reproduces it
    * exactly.
    *
    * Plan: one min-aggregate for first-seen (entity-key shuffle), one join
    * back to events on the same key, one distinct-count on (cohort,
    * offset). The distinct is the only second shuffle — its key space is
    * bounded by cohorts × offsets, tiny at any corpus size.
    *
    * @param tsCol integer event time (any unit)
    * @param width bucket width in `tsCol` units (e.g. 86400e6 µs = day)
    * @return (cohort, offset, n_active) — cohort = first-event bucket
    *         index, offset ≥ 0 buckets since the cohort bucket
    */
  def cohortRetention(events: DataFrame, entityCol: String, tsCol: String,
      width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    // floor division in exact INTEGER arithmetic end-to-end: the subtract-
    // pmod numerator is an exact multiple of width, and `div` (integral
    // division) keeps the whole computation in longs — a double divide
    // would round the numerator for |ts| > 2^53 (raw nanosecond
    // timestamps are ~1.7e18) and could land a boundary value in the
    // wrong bucket. pmod ≥ 0 ⇒ floor (not truncate) semantics for any
    // sign of ts, matching SQL `//`; truncation vs floor is moot after
    // the subtraction since the numerator divides exactly.
    val bucket = {
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      import org.apache.spark.sql.graftbridge.Bridge
      val numer = col(tsCol) - pmod(col(tsCol), lit(width))
      // Column-level IntegralDivide (no SQL-string round-trip, so nested
      // fields and exotic column names resolve like everywhere else)
      Bridge.column(new IntegralDivide(
        Bridge.expression(numer), Bridge.expression(lit(width))))
    }
    val first = events.groupBy(col(entityCol))
      .agg(min(bucket).as("cohort"))
    events.select(col(entityCol), bucket.as("__b"))
      .join(first, Seq(entityCol))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .agg(count_distinct(col(entityCol)).as("n_active"))
  }

  /** Path n-grams: the corpus-wide frequency of every length-`n` run of
    * consecutive event types within an entity's timeline ("user journey"
    * mining — which sequences actually happen, the exploratory complement
    * of [[funnel]]'s fixed hypothesis).
    *
    * Plan: one entity-key window (shuffle + per-entity sort) generates the
    * runs via `lead` — no per-entity collection, state is n−1 lookahead
    * rows; the closing count is map-side combined and the path key space
    * is bounded by |event types|^n, tiny at any corpus size.
    *
    * @param tieCols extra ordering columns breaking `tsCol` ties so the
    *                sequence (and thus the counts) is total-order
    *                deterministic — pass the event's unique id
    * @return (path, n) — path = ">"-joined type sequence. Null-typed
    *         events are excluded up front (a null would silently vanish
    *         inside concat_ws, mislabeling a run as a shorter one); type
    *         values must not themselves contain ">" or distinct journeys
    *         collide under one key
    */
  def pathNgrams(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, n: Int, tieCols: Seq[String] = Nil): DataFrame = {
    require(n >= 2, s"a path needs at least 2 steps, got $n")
    val w = Window.partitionBy(col(entityCol))
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val nexts: Seq[Column] =
      (1 until n).map(i => lead(col(typeCol), i).over(w).as(s"__e$i"))
    events
      .where(col(typeCol).isNotNull)
      .select((col(typeCol) +: nexts): _*)
      .where((1 until n).map(i => col(s"__e$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">",
        (col(typeCol) +: (1 until n).map(i => col(s"__e$i"))): _*).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
  }
}
