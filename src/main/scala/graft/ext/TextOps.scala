package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are narrow
  * per-row transformations (no shuffle) built from codegen'd built-ins —
  * at 100 TB these run at scan speed.
  */
object TextOps {

  /** Common stopword probes used by the heuristics. */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "in")

  private def words(textCol: Column): Column = split(textCol, " ")

  private def isStop(w: Column): Column =
    TextOps.StopWords.map(s => w === lit(s)).reduce(_ || _)

  /** Per-document stats: token count, stopword count/ratio, average word
    * length (derived arithmetically from char count to stay exact:
    * single-space-joined text ⇒ wordChars = len - (n-1)).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nTok = size(ws).cast("long")
    val nStop = size(filter(ws, isStop _)).cast("long")
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      nStop.as("n_stop"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
      ((length(col(textCol)).cast("double") - (nTok.cast("double") - 1)) /
        nTok.cast("double")).as("avg_word_len")
    )
  }

  /** N-gram-free language-ID heuristic: probe for language-marker stopwords.
    * Deterministic CASE cascade — the point is the operator shape (scan-speed
    * classification), not linguistic accuracy on this synthetic corpus.
    */
  def langGuess(textCol: Column): Column = {
    val ws = words(textCol)
    when(array_contains(ws, "the"), "en")
      .when(array_contains(ws, "le"), "fr")
      .when(array_contains(ws, "der"), "de")
      .when(array_contains(ws, "el"), "es")
      .otherwise("xx")
  }

  /** Token counts three ways: whitespace split, BPE-ish regex token classes,
    * and the chars/4 estimator used for LLM budget planning.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("re_tokens"),
      ceil(length(col(textCol)) / 4.0).cast("long").as("est_tokens")
    )

  /** Rolling polynomial fingerprint over words, mod 1e9+7 — a deterministic
    * content signature cheap enough to compute at scan speed; collision
    * probability ~n²/2p. Left fold, so the DuckDB `list_reduce` oracle
    * matches exactly.
    */
  def fingerprint(textCol: Column): Column = {
    val perWord = transform(words(textCol),
      w => (length(w).cast("long") * 256 + ascii(w).cast("long")))
    aggregate(perWord, lit(0L), (h, v) => (h * 31 + v) % 1000000007L)
  }

  /** Boilerplate detection (C4-style, adapted to shingles since this corpus
    * has no line structure): a shingle is boilerplate when it appears in
    * ≥ `minDf` distinct documents; per doc, report how much of its content
    * is boilerplate. Downstream, `boiler_ratio` feeds a filter threshold
    * exactly like [[qualityScore]].
    *
    * Shape at scale: one distinct-shingle pass, a self-aggregated document
    * frequency (small — vocabulary-sized), one join back. The df side is
    * orders of magnitude smaller than the corpus and broadcast-friendly.
    */
  def boilerplateStats(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minDf: Long = 5L): DataFrame = {
    // document frequency as a separate aggregate, broadcast back onto the
    // shingle rows: the df table is vocabulary-sized (tiny next to the
    // corpus) and the aggregate combines map-side. The earlier window-
    // over-partitionBy(s) form put EVERY row of a hot shingle on one task
    // with no partial aggregation — and boilerplate shingles are by
    // definition the hottest ones, a guaranteed straggler at corpus scale.
    val sh = Dedup.shingleRows(docs, idCol, textCol, shingleN)
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    sh.join(broadcast(df), "s")
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        col("n_boiler").cast("double") / col("n_shingles").cast("double"))
  }

  /** Composite quality score in [0,1]: penalize extreme lengths, extreme
    * stopword ratios and single-char word floods. Weights are heuristic but
    * fixed — the operator shape (cheap per-row scoring feeding a filter
    * threshold) is what matters for pipeline use.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nTok = size(ws).cast("double")
    val nStop = size(filter(ws, isStop _)).cast("double")
    val nShort = size(filter(ws, w => length(w) <= 1)).cast("double")
    val lenScore = when(nTok.between(5, 1000), lit(1.0)).otherwise(lit(0.2))
    val stopScore = when((nStop / nTok).between(0.01, 0.6), lit(1.0))
      .otherwise(lit(0.5))
    val shortScore = when(nShort / nTok <= 0.3, lit(1.0)).otherwise(lit(0.4))
    docs.select(col(idCol),
      ((lenScore * 0.4) + (stopScore * 0.3) + (shortScore * 0.3))
        .as("quality"))
  }
}
