package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness tables (`TESTDATA.md`) plus the canonical
  * `logs` view — the testdata stand-in for the reference's log domain
  * (mapping documented in SURVEY.md §7.3):
  *
  * {{{
  *   events.event_id   ↔ log indx        (monotonic append index)
  *   events.ts         ↔ block order     (time = block height)
  *   events.user_id    ↔ address         (emitting contract)
  *   events.event_type ↔ topics[0]       (event-signature topic)
  *   events.props      ↔ data            (ABI payload, here JSON)
  * }}}
  *
  * A synthetic `block_num` (`event_id div 10`) and `block_hash`
  * (sha256 of the number) give the chain-shaped queries (scan by block
  * hash, reorg ancestor walk, logs-per-block) something real to chew on.
  */
object Tables {

  /** Some testdata generations write `events.ts` as parquet
    * TIMESTAMP(NANOS), which Spark does not model; `nanosAsLong` reads it
    * as raw int64 nanoseconds — exactly what the query layer wants (the
    * DuckDB oracle side uses `epoch_us(ts)`, matched by `ts div 1000`).
    * Runtime-settable SQL conf, so this works under a driver-owned session.
    */
  def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ-reinterpretation in [[events]] (and oracle epoch parity
    // generally) assumes UTC; pin it even under a driver-owned session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    withNanos(spark).read.parquet(s"$sfDir/$name.parquet")

  /** The query layer's contract is `ts: BIGINT` epoch-nanoseconds. The
    * driver's generator has produced both TIMESTAMP(NANOS) (read as int64
    * nanos under [[withNanos]]) and TIMESTAMP(MICROS) (a real Spark
    * timestamp) across rounds — normalize the micros form to the same
    * int64-nanos contract so every downstream `ts div 1000` keeps meaning
    * "epoch micros" either way.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // session TZ is pinned UTC, so NTZ→TZ is a no-op reinterpretation
        raw.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")

  /** Canonical log view over `events` (see class doc). 10 logs per block —
    * sf0.001 ⇒ 100 blocks, sf0.1 ⇒ 10k blocks. `block_hash` is
    * deterministic sha256 so both Spark and the DuckDB oracle derive
    * identical hashes.
    */
  def logs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(spark, sfDir)
      .withColumn("block_num", expr("event_id div 10"))
      .withColumn("block_hash", sha2(col("block_num").cast("string"), 256))
  }

  /** Distinct block headers derived from [[logs]]: number, hash, parent. */
  def blocks(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    logs(spark, sfDir)
      .select(col("block_num"))
      .distinct()
      .withColumn("block_hash", sha2(col("block_num").cast("string"), 256))
      .withColumn(
        "parent_hash",
        sha2((col("block_num") - 1).cast("string"), 256)
      )
  }
}
