package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val embs = Tables.embeddings(spark, d)
    embs.count() // warm
    def t(name: String)(f: => Unit): Unit = {
      val s = System.nanoTime(); f
      println(f"[prof] $name%-22s ${(System.nanoTime()-s)/1e9}%.2f s")
    }
    t("bucketed (checkpoint)") {
      ext.Similarity.lshBandedCapped(embs, "embedding", 64, 4, 8, 1000L).count()
    }
    val bucketed = ext.Similarity.lshBandedCapped(embs, "embedding", 64, 4, 8, 1000L)
    val pa = bucketed.select(col("tbl"), col("lsh_bucket"), col("vec_id").as("id"))
    val pb = bucketed.select(col("tbl"), col("lsh_bucket"), col("vec_id").as("neighbor"))
    val cand = pa.join(pb, Seq("tbl", "lsh_bucket"))
      .where(col("id") =!= col("neighbor")).select("id", "neighbor")
    t("cand raw count")  { println("  raw pairs: " + cand.count()) }
    t("cand distinct")   { println("  uniq pairs: " + cand.distinct().count()) }
    t("full knnJoin")    {
      ext.Similarity.knnJoin(embs, "vec_id", "embedding", 64, 4, 5, 1000L, 8)
        .write.format("noop").mode("overwrite").save()
    }
    t("full knnJoin rep2") {
      ext.Similarity.knnJoin(embs, "vec_id", "embedding", 64, 4, 5, 1000L, 8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
