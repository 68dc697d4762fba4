package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** T3 — checkpoint/resume, the Spark-native way (SURVEY.md §2.8): a file
  * source with a per-filter `checkpointLocation` survives a restart and
  * never reprocesses committed data — the engine's replacement for the
  * reference's `lastBlock_<filterhash>` KV row
  * (`TestTrackerSyncerRestarts`, tracker_test.go:221-275).
  */
class StreamCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("block_num", LongType)))

  test("file-source stream resumes from checkpoint without duplicates") {
    val src = tmpDir("src")
    val out = tmpDir("out")
    val ckpt = tmpDir("ckpt")  // = checkpoint dir keyed by filter hash

    def writeBatch(from: Long, to: Long): Unit =
      (from to to).map(i => (i, i / 10)).toDF("event_id", "block_num")
        .coalesce(1).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    writeBatch(0, 49)
    runOnce()
    assert(spark.read.parquet(out).count() == 50)

    // "restart": new files arrive, a fresh query on the same checkpoint
    // must pick up ONLY the delta
    writeBatch(50, 79)
    runOnce()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 80)
    val ids = rows.select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(0L until 80L)) // exactly once, no gaps, no dupes

    // idempotent: re-running with no new data adds nothing
    runOnce()
    assert(spark.read.parquet(out).count() == 80)
  }
}
