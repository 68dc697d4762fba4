package graft.reorg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.BlockHeader

/** Chain reconciliation (SURVEY.md §2.8 T4/T5, ref `tracker.go:291-314,
  * 637-666, 786-829`): given the stored header backlog and an incoming live
  * chain, decide which stored blocks (and their logs) must be *retracted*
  * and which live blocks must be *applied*.
  *
  * The reference walks parent pointers one block at a time
  * (`findAncestor`); the Spark-native form is set-based — a self-join of
  * stored vs live headers on height keeps the whole reconcile declarative
  * and partition-parallel, and both are bounded by `maxBacklog` (deeper
  * divergence is an error in the reference too, `tracker.go:313`).
  */
object Reconciler {

  /** Outcome of one reconcile step.
    *
    * @param ancestor   highest common height (−1 = no overlap at all)
    * @param removed    stored headers above the ancestor, oldest-first —
    *                   `removeLogs` collects newest-first and `revertLogs`
    *                   re-reverses, so retractions EMIT oldest-first
    *                   (ref `tracker.go:717-761`; proven by the Removed
    *                   ordering in `tracker_test.go:584-590`)
    * @param added      live headers above the ancestor, oldest-first — the
    *                   apply order (ref `tracker.go:797-822`)
    */
  final case class Result(
      ancestor: Long,
      removed: Seq[BlockHeader],
      added: Seq[BlockHeader]
  )

  /** J1 — common ancestor of two header sets as a set operation:
    * max height where hashes agree. Returns −1 when nothing agrees.
    */
  def findAncestor(stored: DataFrame, live: DataFrame): Long = {
    val s = stored.select(col("number").as("n"), col("hash").as("sh"))
    val l = live.select(col("number").as("n"), col("hash").as("lh"))
    val r = s.join(l, "n").where(col("sh") === col("lh"))
      .agg(max("n")).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** Full reconcile of in-memory backlogs (driver-side, both bounded by
    * `maxBacklog` — ref `tracker.go:34`). Errors when the divergence is
    * deeper than the stored backlog can prove (ref `tracker.go:313`).
    */
  def reconcile(
      stored: Seq[BlockHeader],
      live: Seq[BlockHeader],
      maxBacklog: Int
  ): Result = {
    require(live.nonEmpty, "live chain empty")
    val storedByNum = stored.map(h => h.number -> h).toMap
    val liveSorted = live.sortBy(_.number)
    // highest height where stored hash == live hash
    val ancestor = liveSorted.reverse
      .find(h => storedByNum.get(h.number).exists(_.hash == h.hash))
      .map(_.number)
      .getOrElse(-1L)
    if (stored.nonEmpty && ancestor < 0) {
      val minStored = stored.map(_.number).min
      val minLive = liveSorted.head.number
      if (minLive > minStored || stored.size >= maxBacklog)
        throw new IllegalStateException(
          s"reorg deeper than backlog ($maxBacklog)")
    }
    val removed = stored.filter(_.number > ancestor).sortBy(_.number)
    val added = liveSorted.filter(_.number > ancestor)
    Result(ancestor, removed, added)
  }

  /** Log-level consequence of a reconcile, as DataFrames (CDC form,
    * SURVEY.md §1.1d): retract stored logs above the ancestor, then apply
    * live logs of the added blocks — both oldest-first, exactly the event
    * order the reference emits (tracker.go:786-795 + revertLogs).
    *
    * The emission order is carried by an EXPLICIT `cdc_phase` column
    * (0 = del, 1 = add) plus the natural keys (indx / block_num, tx_index):
    * a DataFrame's row order only survives to a terminal collect, so any
    * consumer that shuffles or re-partitions must re-sort on these columns
    * — per-side sorts before the union would be silently discarded.
    *
    * @param storedLogs logs table with (indx, block_num, block_hash, …)
    * @param liveLogs   log source keyed by block_hash (S2 per-block fetch)
    */
  def logDelta(
      storedLogs: DataFrame,
      liveLogs: DataFrame,
      result: Result
  ): DataFrame = {
    val removedLogs = storedLogs
      .where(col("block_num") > result.ancestor)
      .withColumn("action", lit("del"))
      .withColumn("cdc_phase", lit(0))
    val addedHashes = result.added.map(_.hash)
    val addedLogs =
      if (addedHashes.isEmpty) liveLogs.where(lit(false))
      else liveLogs.where(col("block_hash").isin(addedHashes: _*))
    val appliedLogs = addedLogs
      .withColumn("action", lit("add"))
      .withColumn("cdc_phase", lit(1))
    removedLogs.unionByName(appliedLogs, allowMissingColumns = true)
      .orderBy(col("cdc_phase"), col("indx"), col("block_num"),
        col("tx_index"))
  }
}
