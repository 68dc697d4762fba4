package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Add-k-smoothed bigram language model over a tokenized corpus — the
  * KenLM/CCNet-shaped fluency signal of an LLM-data pipeline: train counts
  * on a (large) reference slice, score every document's bigrams under the
  * model, filter or bucket on the score. Unlike [[graft.queries.PipelineQueries]]'
  * `rarity_score` (a unigram surprisal proxy), this conditions on the
  * previous token, so word-salad that reuses common words still scores
  * badly.
  *
  * Scale shape: bigram sites expand shuffle-free (the same slice-zip
  * device as [[Dedup.shingleRows]] — no window, no lead/lag shuffle);
  * model training is two map-side-combinable aggregates over the sites
  * (bigram counts, context counts) plus a one-row vocab aggregate;
  * scoring is one shuffle join of sites against the bigram table (both
  * Zipf-bounded: unique-bigram count grows sublinearly in corpus size), a
  * second against the context table, and a broadcast of the one-row vocab.
  * Nothing is ever collected to the driver.
  *
  * Exactness: the smoothed probability (c2+k)/(c1+k·V) is one
  * correctly-rounded IEEE division of integer-valued operands, and the
  * per-doc sum runs as a position-ordered fold (sort_array + aggregate ↔
  * DuckDB list(ORDER BY) + list_reduce) — the same oracle-exact device as
  * `rarity_score`/`embed_centroid`. The ln-based perplexity column is the
  * one engine-specific value (libm ln), covered by LmSpec, not the oracle.
  */
object Lm {

  /** The trained model: `bigrams` (w1, w2, c2), `contexts` (w1, c1 — the
    * count of w1 as a bigram HISTORY, i.e. Σ_w2 c2(w1,w2)), and `vocab`, a
    * single row (__v = distinct token count) that rides every scoring plan
    * as a broadcast — no driver-side count() action.
    */
  final case class BigramModel(
      bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** (id, pos, w1, w2) bigram sites of every document, one row per
    * ADJACENT token pair (pos = 0-based site index). Shuffle-free narrow
    * expansion: the word array is zipped against its own shifted slice —
    * plain expressions inside whole-stage codegen, no per-doc window.
    * Documents with fewer than two tokens yield no rows.
    */
  def bigramSites(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val z = Dedup.slidingZip(split(col(textCol), " "), 2)
    docs.select(col(idCol), posexplode(z).as(Seq("pos", "bg")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("bg").getField("0").as("w1"), col("bg").getField("1").as("w2"))
  }

  /** Train the bigram model on `train`. Both count tables come off ONE
    * sites expansion; the context table is the bigram table re-aggregated
    * (c1(w1) = Σ c2(w1,·)), so w1's count means "times w1 started a
    * bigram" — the denominator a conditional model needs (NOT the raw
    * unigram count, which would include final-position tokens and break
    * Σ_w2 p(w2|w1) = 1).
    */
  def train(train: DataFrame, idCol: String, textCol: String): BigramModel = {
    val sites = bigramSites(train, idCol, textCol)
    val bigrams = sites.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = train
      .select(explode(split(col(textCol), " ")).as("w"))
      .agg(countDistinct(col("w")).as("__v"))
    BigramModel(bigrams, contexts, vocab)
  }

  /** Persist a trained model as three plain parquet tables (bigrams,
    * contexts, the one-row vocab) — the offline-train / online-score
    * seam: a streaming curation ingest loads the model once per run and
    * scores each micro-batch against it. Scoring joins shuffle both sides
    * on the bigram key regardless of file layout, so no clustering is
    * imposed at write time.
    */
  def save(model: BigramModel, path: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    model.contexts.write.mode("overwrite").parquet(s"$path/contexts")
    model.vocab.write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BigramModel =
    BigramModel(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      spark.read.parquet(s"$path/vocab"))

  /** Interpolated Kneser–Ney bigram model — the smoothing KenLM actually
    * ships, distinguished from add-k by scoring a word on how many
    * DISTINCT contexts it follows (its continuation count), not how often
    * it occurs; "San Francisco"-style collocations stop inflating the
    * unigram backoff. Same table shapes as [[BigramModel]] plus the
    * continuation counts — all Zipf-bounded, all from one sites pass.
    *
    *  - `contexts`:      (w1, c1 = Σ c2, n1f = distinct w2 after w1)
    *  - `continuations`: (w2, n1p = distinct w1 before w2)
    *  - `stats`:         one row (__t = distinct bigram types,
    *                     __v = vocab size), broadcast like vocab
    */
  final case class KnModel(bigrams: DataFrame, contexts: DataFrame,
      continuations: DataFrame, stats: DataFrame)

  /** Train the KN count tables — the bigram aggregate re-aggregated twice
    * (by context, by continuation), plus the one-row type/vocab stats.
    */
  def trainKn(train: DataFrame, idCol: String, textCol: String): KnModel = {
    val sites = bigramSites(train, idCol, textCol)
    val bigrams = sites.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1f"))
    val continuations = bigrams.groupBy("w2").agg(count(lit(1)).as("n1p"))
    val stats = bigrams.agg(count(lit(1)).as("__t")).crossJoin(
      train.select(explode(split(col(textCol), " ")).as("w"))
        .agg(countDistinct(col("w")).as("__v")))
    KnModel(bigrams, contexts, continuations, stats)
  }

  /** Score documents under interpolated Kneser–Ney with absolute discount
    * `d` (the standard 0.75):
    *
    *   p(w2|w1) = max(c2−d, 0)/c1 + (d·n1f(w1)/c1)·Pcont(w2)   when c1 > 0
    *            = Pcont(w2)                                     unseen w1
    *   Pcont(w2) = (n1p(w2) + 1)/(T + V)   — add-1 on continuation
    *               counts so unseen w2 keeps positive mass
    *
    * Every operand is an exact integer (counts) or the literal d = 0.75
    * (an exact binary double whose integer multiples stay exact), and the
    * op sequence is written identically in the SQL oracle — so
    * `sum_kn`, the position-ordered fold of p, is oracle-exact like
    * [[score]]'s `sum_condp`. `n_backoff` counts sites that fell through
    * to the pure continuation distribution (unseen context).
    */
  def scoreKn(docs: DataFrame, idCol: String, textCol: String,
      model: KnModel, d: Double = 0.75): DataFrame = {
    val c1d = col("c1").cast("double")
    val pcont: Column =
      (coalesce(col("n1p"), lit(0L)) + lit(1L)).cast("double") /
        (col("__t") + col("__v")).cast("double")
    val p: Column = when(col("c1").isNull, col("pcont"))
      .otherwise(
        greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(d),
          lit(0.0)) / c1d +
          ((lit(d) * col("n1f").cast("double")) / c1d) * col("pcont"))
    bigramSites(docs, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .join(model.continuations, Seq("w2"), "left")
      .crossJoin(broadcast(model.stats))
      .withColumn("pcont", pcont)
      .withColumn("p", p)
      .withColumn("backoff",
        when(col("c1").isNull, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("backoff")).as("n_backoff"),
        sort_array(collect_list(struct(col("pos"), col("p")))).as("xs"))
      .select(col(idCol), col("n_bigrams"), col("n_backoff"),
        aggregate(transform(col("xs"), r => r.getField("p")),
          lit(0.0), (a, b) => a + b).as("sum_kn"))
  }

  /** Score every document of `docs` under `model` with add-`k` smoothing:
    * per bigram site, p(w2|w1) = (c2+k)/(c1+k·V); per document,
    *  - `n_bigrams` — scored sites,
    *  - `n_oov`     — sites whose bigram the model has never seen,
    *  - `sum_condp` — position-ordered fold of p (the oracle-exact
    *                  engine-neutral aggregate),
    *  - `avg_logp`  — mean ln p (the standard LM score; libm ln, so
    *                  spec-verified rather than oracle-compared),
    *  - `ppl`       — exp(−avg_logp), perplexity.
    * Documents with fewer than two tokens have no bigrams and drop out.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: BigramModel, k: Long = 1L): DataFrame = {
    val sites = bigramSites(docs, idCol, textCol)
    val p: Column =
      (coalesce(col("c2"), lit(0L)) + lit(k)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + lit(k) * col("__v")).cast("double")
    sites
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .withColumn("p", p)
      // ln once per SITE row (distributed, pre-shuffle) — not per element
      // of the collected array on the post-aggregate driver-visible path
      .withColumn("lp", log(col("p")))
      .withColumn("oov", when(coalesce(col("c2"), lit(0L)) === 0, 1L)
        .otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("oov")).as("n_oov"),
        sort_array(collect_list(struct(col("pos"), col("p"), col("lp"))))
          .as("xs"))
      .select(col(idCol),
        col("n_bigrams"), col("n_oov"),
        aggregate(transform(col("xs"), r => r.getField("p")),
          lit(0.0), (a, b) => a + b).as("sum_condp"),
        (aggregate(transform(col("xs"), r => r.getField("lp")),
          lit(0.0), (a, b) => a + b) /
          col("n_bigrams").cast("double")).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }
}
