package graft

import graft.model.FilterConfig
import graft.stream.LiveSync

/** The assembled live pipeline: DataSourceV2 AIMD source → standing filter →
  * indexed store, under a real streaming checkpoint. Restarting against a
  * longer chain must append only the delta (T3), and the standing filter is
  * applied inside the stream (P1/P2).
  */
class LiveSyncSpec extends SparkSpec {
  import spark.implicits._

  test("source → filter → store end-to-end with checkpointed restart") {
    val root = tmpDir("live")
    // ChainSource emits 2 logs for even blocks, 5 for odd (blocks 0..head);
    // filter: address a1 (num%3==1) + topic sig1 (num%2==1)
    val filter = FilterConfig(addresses = Seq("a1"), topics = Seq(Some("sig1")))
    val q1 = LiveSync.start(spark, root, filter, headBlock = 59,
      batchSize = 7, maxLogsPerBatch = 12)
    q1.awaitTermination(120000)
    val table = new graft.store.LogTable(spark, root, filter.hash)
    def expected(head: Long) =
      (0L to head).filter(n => n % 3 == 1 && n % 2 == 1).map(_ => 5L).sum
    assert(table.read.count() == expected(59))
    // restart with a longer chain: only blocks 60..99 are processed
    val q2 = LiveSync.start(spark, root, filter, headBlock = 99,
      batchSize = 7, maxLogsPerBatch = 12)
    q2.awaitTermination(120000)
    assert(table.read.count() == expected(99))
    // exactly once across the restart
    val txs = table.read.select("tx_hash").as[String].collect()
    assert(txs.length == txs.distinct.length)
    // indices remain dense after two streaming sessions
    val idx = table.read.select("indx").as[Long].collect().sorted
    assert(idx.sameElements(idx.indices.map(_.toLong)))
  }
}
