package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.model.BlockHeader
import graft.stream.EventStream.{Backlog, HeadObservation, HeaderAction}

/** The reorg tail on Spark 4's arbitrary-state API v2 (`transformWithState`
  * + `StatefulProcessor`): same semantics as
  * [[EventStream.reconcileHead]] (the `flatMapGroupsWithState` form), but
  * with typed state handles — the forward-looking engine path, since state
  * v2 adds state TTL, schema evolution, and the RocksDB changelog backend
  * the 100 TB deployment needs. Both implementations share the golden-case
  * semantics (ReorgSpec / StreamSpec assert the v1 form; TwsReorgSpec runs
  * the same fork scenario through this one).
  */
class ReorgProcessor(maxBacklog: Int)
    extends StatefulProcessor[String, HeadObservation, HeaderAction] {

  @transient private var backlogState:
      org.apache.spark.sql.streaming.ValueState[Backlog] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    backlogState = getHandle.getValueState[Backlog](
      "backlog", Encoders.product[Backlog], org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      inputRows: Iterator[HeadObservation],
      timerValues: TimerValues
  ): Iterator[HeaderAction] = {
    // share the exact reconcile semantics with the v1 implementation —
    // one body, two state APIs
    val state = new ValueGroupState(backlogState)
    EventStream.reconcileHead(maxBacklog)(key, inputRows, state)
  }
}

object ReorgProcessor {
  /** Wire the processor into a streaming Dataset of head observations. */
  def reorgTailV2(
      heads: Dataset[HeadObservation],
      maxBacklog: Int
  ): Dataset[HeaderAction] = {
    import heads.sparkSession.implicits._
    heads
      .groupByKey(_.filterHash)
      .transformWithState(new ReorgProcessor(maxBacklog),
        TimeMode.None(), OutputMode.Append())
  }
}
