package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-pool documents whose hashed n-gram feature distribution
  * resembles a target domain. Per document,
  *
  *   log w(x) = Σ_sites ( ln p̂_target(f) − ln p̂_raw(f) )
  *
  * under two add-1-smoothed bag-of-hashed-bigrams models (one feature site
  * per adjacent word pair, hashed into `buckets` buckets), then k docs are
  * resampled WITHOUT replacement ∝ exp(log w) via the Gumbel-top-k trick
  * with a deterministic salted-hash uniform — the paper's importance
  * resampling, not a plain argmax (resampling keeps diversity; argmax
  * would fill the selection with near-copies of the single best doc).
  *
  * Scale shape: both models are `buckets`-row tables (a constant, e.g.
  * 4096) built from one map-side-combinable aggregate each, and scoring is
  * a BROADCAST join of feature sites against the bucket table followed by
  * one per-doc aggregate — no corpus-sized shuffle key ever carries more
  * than the doc id. Selection is `orderBy(key).limit(k)` =
  * TakeOrderedAndProject (per-partition top-k, then a k-row merge on the
  * driver), never a global sort.
  *
  * Determinism: the per-doc sum runs as the position-ordered fold (the
  * `Lm.score` device), so log_w is identical across runs and
  * partitionings. ln is libm-bound (engine-local), so the declared query
  * is a rows-only check; DsirSpec verifies the weights against a
  * sequential reference and the selection against the Gumbel-max
  * property.
  */
object Dsir {

  /** The fitted selector: `ratio` = (bucket, llr = ln p̂_t − ln p̂_r), one
    * row per hash bucket — small enough to broadcast at any corpus size.
    */
  final case class Model(ratio: DataFrame, buckets: Int)

  /** (id, pos, bucket) hashed-bigram feature sites — the same shuffle-free
    * slice-zip expansion as [[Lm.bigramSites]], with each bigram hashed
    * into a fixed bucket space so the model size is corpus-independent
    * (DSIR's hashed n-gram generative model).
    */
  def featureSites(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    Lm.bigramSites(docs, idCol, textCol)
      .select(col(idCol), col("pos"),
        pmod(xxhash64(concat_ws(" ", col("w1"), col("w2"))),
          lit(buckets.toLong)).as("bucket"))

  /** Add-1-smoothed hashed-feature log-distribution of `docs`: a DENSE
    * (bucket, logp) table over all `buckets` buckets (zero-count buckets
    * get the smoothing floor — exactly the mass that makes unseen features
    * scoreable).
    */
  private def logDist(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, out: String): DataFrame = {
    val sites = featureSites(docs, idCol, textCol, buckets)
    val counts = sites.groupBy("bucket").agg(count(lit(1)).as("c"))
    val tot = sites.agg(count(lit(1)).as("n"))
    docs.sparkSession.range(buckets.toLong).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("n") + lit(buckets.toLong)).cast("double")).as(out))
  }

  /** Fit the target-vs-raw log-likelihood-ratio table. Both inputs are
    * reduced to `buckets` rows before they meet, so the join is trivially
    * small whatever the corpus sizes.
    */
  def fit(target: DataFrame, raw: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096): Model =
    Model(
      logDist(target, idCol, textCol, buckets, "log_pt")
        .join(logDist(raw, idCol, textCol, buckets, "log_pr"), "bucket")
        .select(col("bucket"), (col("log_pt") - col("log_pr")).as("llr")),
      buckets)

  /** Per-doc log importance weight: the position-ordered fold of llr over
    * the doc's feature sites. Docs with < 2 tokens have no sites and drop
    * out (they carry no evidence either way).
    */
  def logWeights(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    featureSites(docs, idCol, textCol, model.buckets)
      .join(broadcast(model.ratio), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sort_array(collect_list(struct(col("pos"), col("llr")))).as("xs"))
      .select(col(idCol), col("n_feats"),
        aggregate(transform(col("xs"), r => r.getField("llr")),
          lit(0.0), (a, b) => a + b).as("log_w"))

  /** Gumbel-top-k resampling over a weights table: key = log_w + g where
    * g = −ln(−ln u) and u is a salted-hash uniform in (0,1) — by the
    * Gumbel-max argument the k largest keys are a draw of k docs without
    * replacement with P ∝ exp(log_w), yet fully deterministic given
    * `salt`. The 15-hex-digit md5 prefix gives 60 uniform bits; +1 / +2
    * offsets keep u strictly inside (0,1) so neither ln can hit ±∞.
    */
  def resample(weights: DataFrame, idCol: String, k: Int,
      salt: String): DataFrame = {
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))),
      1, 15), 16, 10).cast("double")
    val u = (h + lit(1.0)) / lit(Math.pow(16.0, 15.0) + 2.0)
    weights
      .withColumn("gumbel_key", col("log_w") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** End-to-end: fit on (target, raw), weigh the raw pool, resample k. */
  def select(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 4096,
      salt: String = "dsir1"): DataFrame =
    resample(
      logWeights(raw, idCol, textCol, fit(target, raw, idCol, textCol, buckets)),
      idCol, k, salt)
}
