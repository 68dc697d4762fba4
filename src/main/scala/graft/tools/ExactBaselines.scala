package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** The exact-truth sets the measurement tools (`graft.Recall`,
  * [[ProbeSweep]]) calibrate approximate tiers against — ONE definition,
  * so a tie-break or threshold change can never desynchronize a sweep's
  * truth from the published report's. Offline tools only: both collect
  * the full truth set to the driver (quadratic in corpus size; the
  * measurement corpora are small by design).
  */
object ExactBaselines {

  /** Exact global top-k cosine neighbour edges per id (self excluded,
    * ties broken by neighbor id ascending — the knnJoin tie order).
    */
  def knnEdges(e: DataFrame, idCol: String, vecCol: String, k: Int)
      : Set[(Long, Long)] = {
    val withNorm = e.withColumn("__n", sqrt(Similarity.norm2(col(vecCol))))
    val qa = withNorm.select(col(idCol).as("id"), col(vecCol).as("va"),
      col("__n").as("na"))
    val qb = withNorm.select(col(idCol).as("neighbor"),
      col(vecCol).as("vb"), col("__n").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cosine").desc, col("neighbor"))
    qa.crossJoin(qb).where(col("id") =!= col("neighbor"))
      .select(col("id"), col("neighbor"),
        (Similarity.dot(col("va"), col("vb")) /
          (col("na") * col("nb"))).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Exact all-pairs cosine ≥ `minCosine` pair set (id_a < id_b). */
  def cosinePairs(e: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): Set[(Long, Long)] = {
    val withNorm = e.withColumn("__n", sqrt(Similarity.norm2(col(vecCol))))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("__n").as("na"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("__n").as("nb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= minCosine)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }
}
