package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring: a logistic-regression classifier DISTILLED
  * from the rule-based quality screen — the fastText/FineWeb-Edu pattern
  * (cheap rules or an expensive teacher label the corpus, a tiny model
  * generalizes the verdict into a continuous score the pipeline can
  * threshold, bucket, or mixture-weight on). The reference engine has no
  * model-based filtering; this is part of the training-data surface the
  * builder prompt asks for beyond parity.
  *
  * Training is full-batch gradient descent, shaped for a 100 TB corpus:
  * the feature table is computed once (narrow, codegen'd — the same
  * signals the rule screen reads) and EACH of the `iters` iterations is
  * ONE map-side-combinable aggregate producing the d+1 gradient sums
  * (d = 4 features + bias); the driver holds only the weight vector —
  * never data. No per-row state, no shuffle per iteration, no feature
  * rescan (eager localCheckpoint cuts the lineage once).
  *
  * Determinism note: σ(x) = 1/(1+e^(−x)) uses Spark's codegen'd `exp`,
  * and the gradient sums reduce in partition order, so two runs can
  * differ in final ulps. ClassifierSpec therefore compares the trained
  * weights against a sequential reference at tolerance rather than
  * bit-exactly — the ordered-fold devices used for oracle-exact queries
  * would serialize a corpus-sized fold per iteration, which is exactly
  * the non-scalable shape this module avoids; classifier scores are
  * consumed through thresholds and buckets anyway.
  */
object Classifier {

  /** weights(0) = bias, weights(j+1) multiplies feature f{j}. */
  final case class Model(weights: Array[Double]) {
    def margin(prefix: String = "f"): Column =
      weights.toSeq.zipWithIndex.tail
        .map { case (wj, j) => col(s"$prefix${j - 1}") * lit(wj) }
        .foldLeft(lit(weights(0)): Column)(_ + _)
  }

  /** (id, y, f0..f3) feature rows: y = the rule screen's keep verdict
    * (the distillation label), f0 = token count / 100, f1 = stopword
    * ratio, f2 = within-doc duplicate-token ratio, f3 = mean word length.
    * All narrow codegen'd expressions; `split` yields ≥ 1 element so the
    * ratios never divide by zero under ANSI mode.
    */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val nTok = size(ws)
    docs.select(
      col(idCol),
      (TextOps.qualityVerdict(col(textCol)) === "keep")
        .cast("double").as("y"),
      (nTok.cast("double") / lit(100.0)).as("f0"),
      (size(filter(ws, w => w.isin("the", "a", "of", "and", "in")))
        .cast("double") / nTok.cast("double")).as("f1"),
      ((nTok - size(array_distinct(ws))).cast("double") /
        nTok.cast("double")).as("f2"),
      ((length(col(textCol)) - nTok + 1).cast("double") /
        nTok.cast("double")).as("f3"))
  }

  private val NumFeatures = 4

  /** Fit by full-batch GD: w ← w − (lr/n)·Σ (σ(w·x) − y)·x. Deterministic
    * given a deterministic input partitioning up to float-sum order (see
    * the object scaladoc). `feats` should be cached/checkpointed by the
    * caller — each iteration re-reads it.
    */
  def train(feats: DataFrame, iters: Int = 50, lr: Double = 1.0): Model = {
    val n = feats.count().toDouble
    require(n > 0, "cannot train on an empty feature table")
    val w = Array.fill(NumFeatures + 1)(0.0)
    for (_ <- 0 until iters) {
      val margin = (0 until NumFeatures)
        .map(j => col(s"f$j") * lit(w(j + 1)))
        .foldLeft(lit(w(0)): Column)(_ + _)
      val resid = lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")
      val grads = feats.agg(
        sum(resid).as("g0"),
        (0 until NumFeatures)
          .map(j => sum(resid * col(s"f$j")).as(s"g${j + 1}")): _*)
        .collect()(0) // exactly d+1 doubles — bounded by construction
      for (j <- 0 to NumFeatures) w(j) -= lr / n * grads.getDouble(j)
    }
    Model(w)
  }

  /** Score feature rows under a model: the calibrated keep-probability,
    * the thresholded verdict, and agreement with the teaching rules (the
    * audit column a distillation run reports).
    */
  def score(feats: DataFrame, model: Model, idCol: String): DataFrame =
    feats.select(col(idCol), col("y").cast("boolean").as("rule_keep"),
        (lit(1.0) / (lit(1.0) + exp(-model.margin()))).as("score"))
      .withColumn("pred_keep", col("score") >= 0.5)
      .withColumn("agree", col("pred_keep") === col("rule_keep"))
}
