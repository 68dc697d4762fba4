package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Multimodal

object ProfTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()
    def t(name: String)(f: => Unit): Unit = {
      val s = System.nanoTime(); f
      println(f"[prof] $name%-28s ${(System.nanoTime()-s)/1e9}%.2f s")
    }
    t("synthVideoBlobs only") {
      println("  n=" + Multimodal.synthVideoBlobs(docs, "doc_id", "text").count())
    }
    t("video synth+fp") {
      Multimodal.perceptualHash(
        Multimodal.synthVideoBlobs(docs, "doc_id", "text"))
        .write.format("noop").mode("overwrite").save()
    }
    t("synthAudioBlobs only") {
      println("  n=" + Multimodal.synthAudioBlobs(docs, "doc_id", "text").count())
    }
    t("audio synth+fp") {
      Multimodal.perceptualHash(
        Multimodal.synthAudioBlobs(docs, "doc_id", "text"))
        .write.format("noop").mode("overwrite").save()
    }
    t("synthRasterBlobs only") {
      println("  n=" + Multimodal.synthRasterBlobs(docs, "doc_id", "text").count())
    }
    t("raster synth+fp") {
      Multimodal.perceptualHash(
        Multimodal.synthRasterBlobs(docs, "doc_id", "text"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
