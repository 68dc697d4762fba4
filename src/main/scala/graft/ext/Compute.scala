package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism for compute-bound per-row stages
  * (optimization round 12; guide §2.5 "input skew" / §8.3 "fix the
  * per-task work").
  *
  * The harness tables are single small parquet files, so a scan arrives
  * as ONE input split and every narrow compute stage built on it —
  * codec decode, tokenizer encode, ABI decode, MinHash signatures —
  * runs serially on one core no matter how many the session has
  * (measured at sf0.1/local[32]: media_features 3.5 s of executor time
  * in ONE task, unigram_encode 1.9 s, decode_abi 1.7 s). At production
  * scale the same scan carries thousands of row-group splits and needs
  * no help.
  *
  * [[fanOut]] hash-repartitions to the session's default parallelism
  * ONLY when the frame's current partitioning is below it — the tiny-
  * input case, where the one-off exchange moves kilobytes–megabytes to
  * unlock an N-way compute stage. On a production-sized scan
  * (partitions ≥ cores) it adds NOTHING to the plan, so the exchange
  * can never become a payload reshuffle at scale — the guide §8 rule
  * ("move heavy bytes once") is preserved by construction.
  *
  * Hash partitioning on the caller's row id (not round-robin
  * `repartition(n)`) keeps the placement DETERMINISTIC — no
  * sort-before-repartition pass, and re-run tasks land rows identically
  * (SPARK-38388 class of bugs excluded by construction). Every caller's
  * downstream is row-local or aggregate/sort-terminated, so results are
  * bit-identical either way; the determinism is belt-and-braces.
  */
object Compute {
  // A/B kill-switch for measurement only (results are identical either
  // way): SPARK_GRAFT_FANOUT=off restores the raw input partitioning.
  private val enabled = !sys.env.get("SPARK_GRAFT_FANOUT").contains("off")

  def fanOut(df: DataFrame, key: Column): DataFrame = {
    // a streaming frame cannot be .rdd-probed (and its micro-batch
    // partitioning comes from the source): pass it through untouched —
    // the batch twins of the streaming consumers keep the fan-out
    if (!enabled || df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans this frame once to read its partitioning; the frames
    // passed here are scan-rooted projections, so this is metadata-cheap
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
