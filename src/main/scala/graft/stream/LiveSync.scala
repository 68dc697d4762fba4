package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.FilterConfig
import graft.ops.LogOps
import graft.store.LogTable

/** The reference's `Sync` loop as one Structured Streaming pipeline
  * (SURVEY.md §3.2): rate-limited source → standing filter → indexed
  * append, with Spark's checkpoint as the `lastBlock_<hash>` row.
  *
  *  - source: [[ChainSourceProvider]] (DataSourceV2, AIMD admission — T1);
  *  - filter: P1 address membership + P2 positional topics, pushed into the
  *    stream as ordinary predicates;
  *  - sink: `foreachBatch` → [[LogTable.storeLogs]] — per-micro-batch
  *    atomic append with consecutive indices (S8/W1), exactly the
  *    reference's per-batch store transaction;
  *  - restart: the `checkpointLocation` (keyed by filter hash, T3) resumes
  *    at the committed offset; `foreachBatch` is at-least-once, so the sink
  *    additionally skips blocks already stored (idempotent apply).
  */
object LiveSync {

  def start(
      spark: SparkSession,
      root: String,
      filter: FilterConfig,
      headBlock: Long,
      batchSize: Long = 100L,
      maxLogsPerBatch: Long = Long.MaxValue,
      /** false = journaled parquet [[LogTable]]; true = the
        * manifest-committed [[graft.store.TxLogTable]] (each micro-batch
        * append is one invisible data write + one metadata commit).
        */
      transactionalStore: Boolean = false,
      /** Tx-store manifest bound: the streaming sink appends one entry
        * per non-empty micro-batch, so a long tail fragments the table;
        * past this many entries the sink compacts transactionally
        * ([[graft.store.TxLogTable.maintain]]).
        */
      autoCompactEntries: Int = 64
  ): StreamingQuery = {
    val table: graft.store.LogStore =
      if (transactionalStore)
        new graft.store.TxLogTable(spark, root, filter.hash)
      else new LogTable(spark, root, filter.hash)
    val logs = spark.readStream
      .format("graft.stream.ChainSourceProvider")
      .option("headBlock", headBlock)
      .option("batchSize", batchSize)
      .option("maxLogsPerBatch", maxLogsPerBatch)
      .load()
      .where(LogOps.filterAddress(filter.addresses, col("address")))
      .where(LogOps.filterTopics(filter.topics, col("topics")))

    logs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // foreachBatch is at-least-once: a crash after the append but before
        // the micro-batch commit replays the batch — skip blocks already
        // stored (probe bounded by the batch's own hashes)
        if (!batch.isEmpty) {
          val hashes = batch.select("block_hash").distinct()
            .collect().map(_.getString(0)).toSeq
          val existing = table.read
            .where(col("block_hash").isin(hashes: _*))
            .select("block_hash").distinct()
            .collect().map(_.getString(0)).toSet
          val fresh = hashes.filterNot(existing)
          if (fresh.nonEmpty) {
            table.storeLogs(batch.where(col("block_hash").isin(fresh: _*))): Unit
            table match {
              case tx: graft.store.TxLogTable =>
                tx.maintain(autoCompactEntries): Unit
              case _ => ()
            }
          }
        }
      }
      .option("checkpointLocation", s"$root/ckpt/${filter.hash}")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
