package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.stream.EventStream.{FunnelEvent, FunnelProgress, FunnelState}

/** The streaming funnel on Spark 4's arbitrary-state API v2
  * (`transformWithState` + `StatefulProcessor`): same semantics as
  * [[EventStream.funnelTail]] (one shared state-function body,
  * [[EventStream.funnelAdvance]]), but with typed state handles and —
  * the state-v2 win — DECLARATIVE idle eviction: stalled entities expire
  * via the store's own TTL (RocksDB changelog-compatible) instead of a
  * timeout callback, so no timer state rides along per entity.
  *
  * @param idleTtlMs expire mid-funnel state after this much processing-
  *                  time inactivity (≤ 0 = keep forever); requires
  *                  TimeMode.ProcessingTime, which [[FunnelProcessor
  *                  .funnelTailV2]] selects automatically
  */
class FunnelProcessor(steps: Seq[String], maxGap: Option[Long],
    idleTtlMs: Long = -1L)
    extends StatefulProcessor[Long, FunnelEvent, FunnelProgress] {

  @transient private var funnelState:
      org.apache.spark.sql.streaming.ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl =
      if (idleTtlMs > 0) TTLConfig(java.time.Duration.ofMillis(idleTtlMs))
      else TTLConfig.NONE
    funnelState = getHandle.getValueState[FunnelState](
      "funnel", Encoders.product[FunnelState], ttl)
  }

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[FunnelEvent],
      timerValues: TimerValues
  ): Iterator[FunnelProgress] = {
    // idleTimeout = None: eviction is the store TTL here, not a timeout
    val state = new ValueGroupState(funnelState)
    EventStream.funnelAdvance(steps, maxGap, None)(key, inputRows, state)
  }
}

object FunnelProcessor {
  /** Wire the processor into a streaming Dataset of funnel events. */
  def funnelTailV2(
      events: Dataset[FunnelEvent],
      steps: Seq[String],
      maxGap: Option[Long] = None,
      idleTtlMs: Long = -1L
  ): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val timeMode =
      if (idleTtlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.entity)
      .transformWithState(new FunnelProcessor(steps, maxGap, idleTtlMs),
        timeMode, OutputMode.Append())
  }
}
