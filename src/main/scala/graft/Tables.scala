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
    *
    * ==GLOBAL SESSION MUTATION==
    * This also pins `spark.sql.session.timeZone=UTC` on the (possibly
    * shared, driver-owned) session, because oracle parity for every
    * timestamp-RENDERING query (date extraction, `from_unixtime`-style
    * formatting) assumes the DuckDB oracle's UTC. That changes timestamp
    * rendering for UNRELATED queries on the same session — callers
    * embedding this library in a session with a different timezone
    * contract should read tables through their own reader instead of
    * [[table]]. The epoch NORMALIZATION in [[events]] deliberately does
    * not depend on this pin (it is computed timezone-independently), so a
    * later TZ reset cannot silently shift `ts` values of a lazy plan.
    */
  def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case TimestampType =>
        // TimestampType IS epoch-micros; unix_micros extracts the raw
        // int64 — timezone-independent by construction
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // NTZ wall clock treated as UTC, assembled from the NTZ's own
        // date/time fields (all timezone-independent on NTZ input). An
        // earlier form cast NTZ→TIMESTAMP, which reinterprets under
        // whatever spark.sql.session.timeZone holds WHEN THE LAZY PLAN
        // EXECUTES — correct only while the [[withNanos]] UTC pin stays
        // unclobbered. This form cannot shift no matter who resets the
        // session timezone between plan build and execution
        // (TablesSpec proves it under a mid-plan TZ change).
        val t = col("ts")
        val micros =
          unix_date(t.cast(DateType)).cast("long") * lit(86400000000L) +
            hour(t).cast("long") * lit(3600000000L) +
            minute(t).cast("long") * lit(60000000L) +
            (date_part(lit("SECOND"), t) * lit(1000000)).cast("long")
        raw.withColumn("ts", micros * lit(1000L))
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
