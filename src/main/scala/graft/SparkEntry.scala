package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CapabilityQueries, ParityQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (SURVEY.md §7.4):
  *  - [[ParityQueries]]     — one per SQL-expressible reference operator (§2)
  *  - [[CapabilityQueries]] — the relational surface (joins/aggs/windows/
  *                            set ops/scalars) the reference delegates to
  *                            its stores
  *  - [[PipelineQueries]]   — training-data ops (dedup tiers, similarity
  *                            search, text analysis)
  *
  * Non-SQL-expressible behaviors (AIMD batching, reorg reconcile, streaming
  * checkpoint/resume, CDC retraction) live in graft.sync / graft.reorg /
  * graft.stream and are ScalaTest-verified.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The §7.2 end-to-end spine: scan → filter → project → decode → order.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("scan_range")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.defs ++ CapabilityQueries.defs ++ PipelineQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the xxhash64-based ops
    * (dedup_minhash/simhash/embedding, sim_search_lsh) → rows-only check;
    * those are value-verified in ScalaTest instead.
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ CapabilityQueries.oracle ++ PipelineQueries.oracle
}
