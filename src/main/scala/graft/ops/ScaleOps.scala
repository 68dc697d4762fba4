package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques that change the plan, not the result: skew salting and
  * bucketed co-location. These are the knobs a 1000-executor deployment
  * turns when AQE's automatic skew handling isn't enough (AQE splits skewed
  * *partitions*, but a single hot KEY still lands in one task without
  * salting).
  */
object ScaleOps {

  /** Skew-salted equi-join: fact rows get a deterministic salt in
    * `[0, saltFactor)`, the dimension is replicated `saltFactor` times, and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `saltFactor` tasks instead of one.
    *
    * Result-identical to `fact.join(dim, keys)` (inner): each fact row
    * matches exactly the one dim replica carrying its salt.
    *
    * Cost model: dim is replicated ×saltFactor — use for genuinely skewed
    * fact keys against small-to-medium dims; for broadcast-sized dims just
    * broadcast (no salt needed).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt: spread by a hash of the whole fact row, not rand()
    // (retries/speculative tasks must salt identically)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(saltFactor)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Approximate distinct count (HLL++): constant memory per group vs the
    * exact distinct's shuffle of every key. `rsd` trades accuracy for
    * sketch size. The exact/approx pair is the standard two-tier pattern:
    * approx for monitoring/planning, exact only where the answer is the
    * product.
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_nd"),
        count(lit(1)).as("n"))

  /** Bloom-pruned equi-join: build a Bloom filter over the (selective) dim
    * side's keys, prune fact rows that cannot match BEFORE the join
    * shuffle, then join exactly. Result-identical to `fact.join(dim,
    * Seq(key))` (inner) — Bloom filters have no false negatives; false
    * positives just survive to the exact join.
    *
    * This is the manual form of Spark's own `InjectRuntimeFilter` (the
    * same XxHash64 → BloomFilterAggregate / BloomFilterMightContain pair),
    * for when the optimizer's heuristics decline to fire — e.g. the dim
    * side is the output of a computation rather than a filtered scan. The
    * sketch is built in one aggregate job and shipped as a literal (MB-ish
    * at `expectedDimKeys` up to ~10⁷); the fact side then sheds non-joining
    * rows at scan speed instead of shuffling them.
    *
    * Cost model: pays one extra pass over dim + one driver round-trip;
    * wins when fact ≫ dim-matched-fact (the shuffle avoided dwarfs the
    * sketch pass). For broadcast-sized dims just broadcast.
    *
    * `dim` is evaluated twice (once for the sketch, once in the join), so
    * a nondeterministic dim (a sample, a rand() filter) could produce join
    * keys on the second evaluation that the sketch never saw, silently
    * dropping matches. ENFORCED: if the dim's analyzed plan carries any
    * nondeterministic expression it is pinned with an eager
    * `localCheckpoint` first, so both evaluations read the same snapshot.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim0: DataFrame,
      key: String,
      expectedDimKeys: Long = 1000000L
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    require(expectedDimKeys > 0)
    val dim =
      if (dim0.queryExecution.analyzed.exists(
          _.expressions.exists(_.exists(!_.deterministic))))
        dim0.localCheckpoint(true)
      else dim0
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(dim(key))), expectedDimKeys)
      .toAggregateExpression()
    val bloom = dim.select(Bridge.column(agg)).head().getAs[Array[Byte]](0)
    // a dim side with zero rows yields a null sketch — nothing can join
    if (bloom == null) return fact.join(dim, Seq(key)).where(lit(false))
    val mightContain = Bridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      Bridge.expression(xxhash64(fact(key)))))
    fact.where(mightContain).join(dim, Seq(key))
  }

  /** Write both sides bucketed by the join key so the subsequent join is
    * shuffle-free (co-located scan). Requires a catalog table (bucketing
    * metadata lives in the catalog, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
