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

  test("state-v2 funnel matches the fMGWS form on the same replay") {
    import graft.stream.EventStream.FunnelEvent
    import graft.stream.FunnelProcessor
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[FunnelEvent]
      val q = FunnelProcessor.funnelTailV2(in.toDS(),
          Seq("signup", "click", "purchase"))
        .writeStream.format("memory").queryName("tws_funnel")
        .outputMode("append").start()
      // same replay as StreamSpec's fMGWS test, including both re-entry
      // paths (cross-batch for user 1, same-batch for user 2)
      in.addData(FunnelEvent(1L, 100L, "signup"), FunnelEvent(1L, 200L, "click"),
        FunnelEvent(2L, 50L, "click"), FunnelEvent(2L, 150L, "signup"))
      q.processAllAvailable()
      in.addData(FunnelEvent(1L, 300L, "purchase"),
        FunnelEvent(2L, 250L, "click"))
      q.processAllAvailable()
      in.addData(FunnelEvent(1L, 400L, "purchase"), FunnelEvent(1L, 500L, "signup"),
        FunnelEvent(2L, 300L, "purchase"), FunnelEvent(2L, 350L, "signup"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("tws_funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == Set((1L, 1, 100L), (1L, 2, 200L), (1L, 3, 300L),
        (2L, 1, 150L), (2L, 2, 250L), (2L, 3, 300L),
        (1L, 1, 500L), (2L, 1, 350L)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state-v2 funnel TTL evicts stalled entities") {
    import graft.stream.EventStream.FunnelEvent
    import graft.stream.FunnelProcessor
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[FunnelEvent]
      val q = FunnelProcessor.funnelTailV2(in.toDS(), Seq("signup", "click"),
          idleTtlMs = 300L)
        .writeStream.format("memory").queryName("tws_funnel_ttl")
        .outputMode("append").start()
      // TimeMode.ProcessingTime keeps the query perpetually "busy", so
      // processAllAvailable never quiesces (same class of hang as fMGWS
      // ProcessingTimeTimeout) — poll the sink for expected row counts
      // instead; the default trigger picks new MemoryStream data up on
      // its own
      def awaitRows(n: Int): Unit = {
        val deadline = System.currentTimeMillis + 60000
        while (spark.table("tws_funnel_ttl").count() < n &&
          System.currentTimeMillis < deadline) Thread.sleep(100)
        assert(spark.table("tws_funnel_ttl").count() >= n,
          s"timed out waiting for $n rows")
      }
      in.addData(FunnelEvent(1L, 100L, "signup"))
      awaitRows(1)
      Thread.sleep(1500) // let the store TTL expire the mid-funnel state
      // expired state is invisible: a second signup is a fresh step-1
      // entry and re-emits (with live state it would be a duplicate-
      // ignored repeat and the row count would stay at 1). Progression
      // within the TTL window is covered by the no-TTL replay test —
      // asserting it here would race the (deliberately tiny) TTL.
      in.addData(FunnelEvent(1L, 900L, "signup"))
      awaitRows(2)
      q.stop()
      val got = spark.table("tws_funnel_ttl").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
      assert(got == Seq((1L, 1, 100L), (1L, 1, 900L)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
