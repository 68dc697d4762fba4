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

  test("streaming over the transactional backend: same end-to-end contract, manifest commits per batch") {
    val root = tmpDir("live-tx")
    val filter = FilterConfig(addresses = Seq("a1"), topics = Seq(Some("sig1")))
    val q1 = LiveSync.start(spark, root, filter, headBlock = 59,
      batchSize = 7, maxLogsPerBatch = 12, transactionalStore = true,
      autoCompactEntries = 3)
    q1.awaitTermination(120000)
    val table = new graft.store.TxLogTable(spark, root, filter.hash)
    def expected(head: Long) =
      (0L to head).filter(n => n % 3 == 1 && n % 2 == 1).map(_ => 5L).sum
    assert(table.read.count() == expected(59))
    // restart with a longer chain: only the delta appends, exactly once
    val q2 = LiveSync.start(spark, root, filter, headBlock = 99,
      batchSize = 7, maxLogsPerBatch = 12, transactionalStore = true,
      autoCompactEntries = 3)
    q2.awaitTermination(120000)
    assert(table.read.count() == expected(99))
    val txs = table.read.select("tx_hash").as[String].collect()
    assert(txs.length == txs.distinct.length)
    val idx = table.read.select("indx").as[Long].collect().sorted
    assert(idx.sameElements(idx.indices.map(_.toLong)))
    // the micro-batch appends landed as manifest commits (one data dir
    // per non-empty batch, no journal artifacts anywhere)
    val dataDirs = new java.io.File(
      s"$root/txlogs/filter_hash=${filter.hash}/data").listFiles()
    assert(dataDirs != null && dataDirs.count(_.isDirectory) > 1)
    def names(f: java.io.File): Seq[String] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(x => x.getName +: names(x))
    assert(!names(new java.io.File(root)).exists(_.contains(".tmp-")))
    // the per-batch maintain() kept the live manifest bounded, via
    // transactional compactions recorded in the history
    val hist = table.history()
    assert(hist.orderBy($"version".desc).select("entries")
      .as[Long].head() <= 4, "auto-compaction did not bound the manifest")
    assert(hist.select("operation").as[String].collect().contains("optimize"))
    // compaction collapses the streaming fragments transactionally; a
    // retention-1 maintainer prunes the manifest history it commits, so
    // the streaming fragments become reclaimable immediately
    val maintainer = new graft.store.TxLogTable(spark, root, filter.hash,
      retainVersions = 1)
    maintainer.compact()
    assert(maintainer.vacuum(olderThanMs = 0L) >= 1)
    assert(table.read.count() == expected(99))
  }

  test("T7 streaming twin: progress ticks bridge from the listener bus") {
    val root = tmpDir("live")
    val ticks = new java.util.concurrent.ConcurrentLinkedQueue[graft.sync.SyncProgress]()
    val box = new graft.sync.LatestTickBox
    val bridge = new graft.stream.StreamProgressBridge(p => {
      ticks.add(p); box.onProgress(p)
    })
    // a second, misbehaving consumer must lose ticks, not kill the stream
    val bad = new graft.stream.StreamProgressBridge(
      _ => sys.error("misbehaving consumer"))
    spark.streams.addListener(bridge)
    spark.streams.addListener(bad)
    try {
      val q = LiveSync.start(spark, root, FilterConfig(), headBlock = 39,
        batchSize = 8)
      q.awaitTermination(120000)
      // the listener bus is async — drain it before asserting
      var waited = 0
      while (ticks.size() < 5 && waited < 200) { Thread.sleep(50); waited += 1 }
      val got = ticks.toArray(Array.empty[graft.sync.SyncProgress]).toSeq
      assert(got.nonEmpty, "no progress ticks bridged")
      assert(got.forall(_.phase == "stream"))
      // the chain-source cursor is monotone across batches and reaches head
      val cursors = got.map(_.current)
      assert(cursors == cursors.sorted, s"cursor not monotone: $cursors")
      assert(cursors.last == 39L, s"cursor stopped at ${cursors.last}")
      // cumulative input rows cover the stored log count (match-all
      // filter); a foreachBatch sink re-executes the batch frame
      // (isEmpty / distinct / count / write), and numInputRows counts
      // source READS — so appended can exceed, never undershoot
      val table = new graft.store.LogTable(spark, root, FilterConfig().hash)
      assert(got.last.appended >= table.read.count())
      // the poll mailbox holds the freshest tick
      assert(box.poll().contains(got.last))
    } finally {
      spark.streams.removeListener(bridge)
      spark.streams.removeListener(bad)
    }
  }
}
