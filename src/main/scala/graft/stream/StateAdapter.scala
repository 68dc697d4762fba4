package graft.stream

import org.apache.spark.sql.streaming.{GroupState, ValueState}

/** Minimal GroupState adapter over a state-v2 ValueState, so one state-
  * function body serves both streaming APIs (`flatMapGroupsWithState` and
  * `transformWithState`). Only the members the shared bodies touch are
  * live; timeout members are inert — under state v2 idle eviction is the
  * store's declarative TTL, not a timeout callback.
  */
private[stream] final class ValueGroupState[S](vs: ValueState[S])
    extends GroupState[S] {
  override def exists: Boolean = vs.exists()
  // GroupState.get contracts a NoSuchElementException when absent; a bare
  // vs.get() would return null here and surface as a distant NPE only
  // under the v2 path
  override def get: S = getOption.getOrElse(
    throw new NoSuchElementException("State is either not defined or has already been removed"))
  override def getOption: Option[S] = Option(vs.get())
  override def update(s: S): Unit = vs.update(s)
  override def remove(): Unit = vs.clear()
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
