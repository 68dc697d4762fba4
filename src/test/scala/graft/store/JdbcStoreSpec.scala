package graft.store

import org.apache.spark.sql.functions._

import graft.{MockChain, MockProvider, SparkSpec}
import graft.model.FilterConfig
import graft.sync.Syncer

/** The reference's backend-conformance suite (`store/testing.go:10-242`)
  * over the THIRD store backend — the RDBMS pair
  * ([[JdbcLogStore]]/[[JdbcKvStore]], mirroring
  * `postgresql_store.go:79-158`) on embedded Derby — plus an end-to-end
  * mock-chain sync with a reorg through the injected backend, proving the
  * `LogStore`/`KeyValueStore` seams carry the whole engine, not just the
  * parquet implementations.
  */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def url(): String =
    s"jdbc:derby:${tmpDir("jdbc")}/db;create=true"

  private def mkLogs(blockFrom: Long, blockTo: Long, perBlock: Int = 2) =
    (blockFrom to blockTo).flatMap { b =>
      (0 until perBlock).map(i =>
        (i.toLong, s"tx-$b-$i", b, s"h$b", s"a${b % 3}",
          Seq("sig"), "0x"))
    }.toDF("tx_index", "tx_hash", "block_num", "block_hash", "address",
      "topics", "data")

  private def idxOf(t: LogStore): Seq[Long] =
    t.read.select("indx").as[Long].collect().sorted.toSeq

  test("store/read-back round trip with consecutive indices (testing.go:22-63)") {
    val t = new JdbcLogStore(spark, url(), "f1")
    assert(t.lastIndex() == 0L)
    assert(t.storeLogs(mkLogs(0, 4)) == 10L)
    assert(t.lastIndex() == 10L)
    assert(idxOf(t) == (0L until 10L))
    // payload round trip incl. the topics array
    val row = t.getLog(3L).head()
    assert(row.getAs[scala.collection.Seq[String]]("topics").toSeq ==
      Seq("sig"))
    assert(row.getAs[String]("data") == "0x")
  }

  test("remove-then-reappend continues the sequence (testing.go:104-143)") {
    val t = new JdbcLogStore(spark, url(), "f1")
    t.storeLogs(mkLogs(0, 4))
    val removed = t.removeLogsFrom(6L)
    assert(removed.count() == 4)
    assert(removed.select("indx").as[Long].collect().toSeq == (6L until 10L))
    assert(t.lastIndex() == 6L)
    t.storeLogs(mkLogs(3, 4))
    assert(idxOf(t) == (0L until 10L))
    assert(t.removeLogsFrom(99L).count() == 0)
  }

  test("multiple independent filter tables (testing.go:22-63)") {
    val u = url()
    val t1 = new JdbcLogStore(spark, u, "f1")
    val t2 = new JdbcLogStore(spark, u, "f2")
    t1.storeLogs(mkLogs(0, 1))
    assert(t1.lastIndex() == 4L && t2.lastIndex() == 0L)
    t2.storeLogs(mkLogs(0, 0))
    assert(t2.lastIndex() == 2L && t1.lastIndex() == 4L)
  }

  test("kv get/set/update + prefix listing (testing.go:65-102,199-242)") {
    val kv = new JdbcKvStore(spark, url())
    assert(kv.get("k1").isEmpty)
    kv.set("k1", "v1")
    assert(kv.get("k1").contains("v1"))
    kv.set("k1", "v2")
    assert(kv.get("k1").contains("v2"))
    kv.set("filter_a", "1"); kv.set("filter_b", "2"); kv.set("last_x", "3")
    assert(kv.listPrefix("filter_").select("key").as[String].collect()
      .toSeq == Seq("filter_a", "filter_b"))
  }

  test("a failed distributed append repairs to the pre-append watermark " +
    "(no durable INDX gap)") {
    // the distributed JDBC sink commits per partition on separate
    // connections; a mid-job failure must not leave a permanent hole in
    // the consecutive-index sequence. Poison ONE row (TX_HASH over the
    // column's 256-char bound) so its partition's insert fails while
    // others may have committed — the repair path must roll the table
    // back to the pre-append watermark whatever the partition schedule
    val t = new JdbcLogStore(spark, url(), "f1")
    t.storeLogs(mkLogs(0, 4))
    val before = t.lastIndex()
    val poisoned = mkLogs(5, 9).withColumn("tx_hash",
      when(col("block_num") === 7L, lit("x" * 300))
        .otherwise(col("tx_hash")))
    intercept[Exception](t.storeLogs(poisoned))
    assert(t.lastIndex() == before, "watermark must be the pre-append one")
    assert(idxOf(t) == (0L until before),
      "indices must stay consecutive — no partial partitions survive")
    // a caller retry with a clean batch continues the sequence
    t.storeLogs(mkLogs(5, 9))
    assert(idxOf(t) == (0L until before + 10L))
  }

  test("kv values beyond 32k round-trip (CLOB, the reference's TEXT shape)") {
    val kv = new JdbcKvStore(spark, url())
    val big = ("x" * 64000) + "end"
    kv.set("blob", big)
    assert(kv.get("blob").contains(big))
    // and through the Spark-side prefix scan
    assert(kv.listPrefix("blob").select("value").as[String].head() == big)
  }

  test("kv CAS: a stale expectedVersion aborts, drops apply in-commit") {
    val u = url()
    val kv = new JdbcKvStore(spark, u)
    kv.setAll(Map("a" -> "1"), expectedVersion = Some(0L))
    kv.setAll(Map("b" -> "2", "hist@v1" -> "x", "hist@v2" -> "y"),
      expectedVersion = Some(1L))
    intercept[ConcurrentCommitException](
      kv.setAll(Map("c" -> "3"), expectedVersion = Some(1L)))
    assert(kv.get("c").isEmpty)
    // prune in the same commit, like the manifest history window
    kv.setAll(Map("hist@v3" -> "z"),
      drop = k => k.startsWith("hist@") && k < "hist@v3",
      expectedVersion = Some(2L))
    assert(kv.get("hist@v1").isEmpty && kv.get("hist@v2").isEmpty)
    assert(kv.get("hist@v3").contains("z"))
    assert(new JdbcKvStore(spark, u).get("b").contains("2"))
  }

  test("kv CAS: racing first commits on an empty store — one winner, one ConcurrentCommitException") {
    // the empty-store corner: no version row exists yet, so FOR UPDATE
    // has nothing to lock and both writers reach their INSERTs — the
    // loser's duplicate-key (or serialization) failure must surface as
    // the standard CAS conflict, not a raw SQLException
    val u = url()
    val kv = new JdbcKvStore(spark, u) // creates the table
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val results = (0 until 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
          def call(): Option[Throwable] = {
            gate.await()
            try {
              new JdbcKvStore(spark, u).setAll(Map("w" -> s"t$i"),
                expectedVersion = Some(0L))
              None
            } catch { case t: Throwable => Some(t) }
          }
        })
      }
      gate.countDown()
      val failures = results.map(_.get()).flatten
      assert(failures.size == 1,
        s"exactly one loser expected, got ${failures.size}: $failures")
      assert(failures.head.isInstanceOf[ConcurrentCommitException],
        s"loser must see the CAS conflict, got ${failures.head}")
      assert(kv.get("w").exists(v => v == "t0" || v == "t1"))
    } finally pool.shutdown()
  }

  test("predicate pushdown: the point read reaches the JDBC scan") {
    val t = new JdbcLogStore(spark, url(), "f1")
    t.storeLogs(mkLogs(0, 9))
    val plan = t.getLog(7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("INDX"),
      s"expected the INDX predicate pushed to the JDBC source:\n$plan")
  }

  test("end-to-end: mock-chain sync with a reorg through the injected JDBC backend") {
    val u = url()
    val chain = MockChain.linear(30, _ => 1)
    val filter = FilterConfig()
    val store = new JdbcLogStore(spark, u, filter.hash)
    val kv = new JdbcKvStore(spark, u)
    val root = tmpDir("jdbcsync")
    val s1 = new Syncer(spark, new MockProvider(spark, chain), root, filter,
      storeOverride = Some(store), kvOverride = Some(kv))
    s1.sync()
    assert(store.lastIndex() == 30L)
    assert(idxOf(store) == (0L until 30L))
    // fork the top 3 blocks, extend by 2 — the reconciler must retract
    // the orphaned suffix and land the canonical one, all through JDBC
    val forked = MockChain.fork(chain, depth = 3, extend = 2)
    val s2 = new Syncer(spark, new MockProvider(spark, forked), root, filter,
      storeOverride = Some(store), kvOverride = Some(kv))
    s2.sync()
    assert(store.lastIndex() == 32L)
    val byBlock = store.read.select("block_num", "block_hash").distinct()
      .as[(Long, String)].collect().toMap
    assert(byBlock(28L) == "h28F" && byBlock(31L) == "h31F",
      "the forked suffix must be the stored lineage")
    assert(byBlock(26L) == "h26", "pre-fork blocks must be untouched")
  }
}
