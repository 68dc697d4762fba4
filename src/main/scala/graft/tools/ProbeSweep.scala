package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.Tables

/** One-off measurement sweep for the multi-probe pair-mining dial
  * (knnJoin / embeddingNearDup `probes`): recall and wall time per
  * (tables, probes) cell against the same exact baselines `graft.Recall`
  * uses, at sf0.1. Drives the declared-config decision; results land in
  * RECALL.md via the Recall tool once a dial is picked.
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("graft-probe-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir).cache()
    e.count()

    // exact knn top-5 edge set (Recall.scala's formula)
    val knnK = 5
    val withNorm = e.withColumn("__n",
      sqrt(Similarity.norm2(col("embedding"))))
    val qa = withNorm.select(col("vec_id").as("id"),
      col("embedding").as("va"), col("__n").as("na"))
    val qb = withNorm.select(col("vec_id").as("neighbor"),
      col("embedding").as("vb"), col("__n").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cosine").desc, col("neighbor"))
    val exactKnn = qa.crossJoin(qb).where(col("id") =!= col("neighbor"))
      .select(col("id"), col("neighbor"),
        (Similarity.dot(col("va"), col("vb")) /
          (col("na") * col("nb"))).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= knnK)
      .select("id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact all-pairs cosine >= 0.3 pair set
    val a2 = withNorm.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("__n").as("na"))
    val b2 = withNorm.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("__n").as("nb"))
    val exactEmb = a2.crossJoin(b2).where(col("id_a") < col("id_b"))
      .where(Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"exact: knn edges ${exactKnn.size}, emb pairs ${exactEmb.size}")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def minOf2[T](f: => (T, Double)): (T, Double) = {
      val (r1, t1) = f; val (_, t2) = f
      (r1, math.min(t1, t2))
    }

    val cells = Seq((8, 0), (8, 1), (8, 2), (6, 0), (6, 1), (6, 2), (4, 2))
    println("tier tables probes recall time_s")
    cells.foreach { case (t, p) =>
      val (got, secs) = minOf2(timed(
        Similarity.knnJoin(e, "vec_id", "embedding", dim = 64, nbits = 4,
          k = knnK, maxBucket = 1000, tables = t, probes = p)
          .select("id", "neighbor").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet))
      val rec = exactKnn.intersect(got).size.toDouble / exactKnn.size
      println(f"knn $t $p $rec%.3f $secs%.2f")
    }
    cells.foreach { case (t, p) =>
      val (got, secs) = minOf2(timed(
        Dedup.embeddingNearDup(e, "vec_id", "embedding", dim = 64,
          nbits = 4, minCosine = 0.3, maxBucket = 1000, tables = t,
          probes = p)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet))
      val rec = exactEmb.intersect(got).size.toDouble / exactEmb.size
      println(f"emb $t $p $rec%.3f $secs%.2f")
    }
    spark.stop()
  }
}
