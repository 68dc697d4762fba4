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
    val audio = Multimodal.synthAudioBlobs(docs, "doc_id", "text")
    t("audio corpus materialize") { audio.count() }
    t("audio count warm")         { audio.count() }
    t("audio fp pass 1") {
      Multimodal.perceptualHash(audio).write.format("noop").mode("overwrite").save()
    }
    t("audio fp pass 2") {
      Multimodal.perceptualHash(audio).write.format("noop").mode("overwrite").save()
    }
    // driver-side single blob timing
    val one = audio.head()
    t("10k audioFp64 driver-side") {
      var i = 0
      while (i < 10000) { Multimodal.Codecs.audioFp64(one.content); i += 1 }
    }
    spark.stop()
  }
}
