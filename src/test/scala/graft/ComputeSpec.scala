package graft

import org.apache.spark.sql.functions._

import graft.ext.Compute

/** Focused tests for the round-13 Compute internals: the plan-probe
  * fanOut (no Dataset.rdd — must not eagerly execute, must no-op on
  * post-shuffle frames) and the input-byte-guarded pinSmall.
  */
class ComputeSpec extends SparkSpec {
  import spark.implicits._

  test("fanOut widens a single-split scan-rooted frame to the session " +
    "parallelism with identical rows") {
    val dir = tmpDir("fanout-src")
    (0L until 500L).map(i => (i, s"row$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Compute.fanOut(df, col("id"))
    val target = spark.sparkContext.defaultParallelism
    assert(out.rdd.getNumPartitions >= math.min(target, 2),
      "one-split frame should have been fanned out")
    assert(out.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("fanOut is a no-op on a post-shuffle frame (no re-shuffle, no " +
    "eager execution of the upstream exchange)") {
    val df = (0L until 100L).toDF("id")
      .groupBy(col("id") % 7).agg(count(lit(1)).as("n"))
    val out = Compute.fanOut(df, col("n"))
    // identical object: the Exchange guard returned the frame untouched
    assert(out eq df)
  }

  test("fanOut passes streaming frames through untouched") {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
    assert(Compute.fanOut(stream, col("value")) eq stream)
  }

  test("pinSmall checkpoints under the input-byte budget and falls back " +
    "to the unmodified frame above it") {
    val dir = tmpDir("pin-src")
    (0L until 200L).map(i => (i, i * 2)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val input = spark.read.parquet(dir)
    val derived = input.groupBy("id").agg(sum("v").as("s"))
    val pinned = Compute.pinSmall(derived, input, maxBytes = 1L << 30)
    assert(pinned.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "under budget: expected a localCheckpoint (LogicalRDD root)")
    assert(pinned.orderBy("id").collect().toSeq ===
      derived.orderBy("id").collect().toSeq)
    val unpinned = Compute.pinSmall(derived, input, maxBytes = 1L)
    assert(unpinned eq derived,
      "over budget: expected the frame back unchanged")
  }
}
