package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.ReorgProcessor
import graft.stream.EventStream.{HeadObservation, HeaderAction}

/** The transformWithState (state API v2) reorg tail must behave exactly
  * like the flatMapGroupsWithState form on the fork scenario — requires the
  * RocksDB state store provider (state v2 does not run on the default
  * HDFS-backed store).
  */
class TwsReorgSpec extends SparkSpec {
  import spark.implicits._

  test("state-v2 reorg tail: fork retracts then applies") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[HeadObservation]
      val q = ReorgProcessor.reorgTailV2(in.toDS(), maxBacklog = 10)
        .writeStream.format("memory").queryName("tws_tail")
        .outputMode("append").start()
      def h(n: Long, tag: String, p: String) =
        HeadObservation("f", n, s"h$tag", s"h$p")
      in.addData(h(1, "1", "0"), h(2, "2", "1"), h(3, "3", "2"))
      q.processAllAvailable()
      in.addData(h(2, "20", "1"), h(3, "30", "20"))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("tws_tail").as[HeaderAction].collect().toSeq
      assert(out == Seq(
        HeaderAction("f", "add", 1, "h1"),
        HeaderAction("f", "add", 2, "h2"),
        HeaderAction("f", "add", 3, "h3"),
        HeaderAction("f", "del", 2, "h2"),
        HeaderAction("f", "del", 3, "h3"),
        HeaderAction("f", "add", 2, "h20"),
        HeaderAction("f", "add", 3, "h30")))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
