package graft

import org.apache.spark.sql.functions._

import graft.model.FilterConfig
import graft.ops.LogOps

class LogOpsSpec extends SparkSpec {
  import spark.implicits._

  private def logs = Seq(
    (1L, "a1", Seq("sigA", "t1")),
    (2L, "a2", Seq("sigA", "t2")),
    (3L, "a1", Seq("sigB")),
    (4L, "a3", Seq.empty[String])
  ).toDF("indx", "address", "topics")

  test("filterAddress: membership; empty list matches all (tracker.go:63-66)") {
    assert(logs.where(LogOps.filterAddress(Seq("a1"), col("address")))
      .count() == 2)
    assert(logs.where(LogOps.filterAddress(Nil, col("address")))
      .count() == 4)
  }

  test("filterTopics: positional with wildcards (tracker.go:67-69)") {
    // [None, Some(t2)]: wildcard sig, topic[1] must be t2
    val m = logs.where(LogOps.filterTopics(Seq(None, Some("t2")),
      col("topics"))).select("indx").as[Long].collect()
    assert(m.toSeq == Seq(2L))
    // [Some(sigA)]: signature position only
    assert(logs.where(LogOps.filterTopics(Seq(Some("sigA")), col("topics")))
      .count() == 2)
    // a log with fewer topics than the pattern cannot match
    assert(logs.where(LogOps.filterTopics(Seq(Some("sigB"), Some("tX")),
      col("topics"))).count() == 0)
    // empty pattern matches everything
    assert(logs.where(LogOps.filterTopics(Nil, col("topics"))).count() == 4)
  }

  test("filterHash column matches FilterConfig.hash scala-side (F1)") {
    val cfg = FilterConfig(Seq("a1", "a2"), Seq(None, Some("t2")))
    val viaSpark = Seq(1).toDF("x")
      .select(LogOps.filterHash(cfg).as("h")).as[String].head()
    assert(viaSpark == cfg.hash)
  }

  test("parseU64 handles decimal and 0x-hex forms (tracker.go:862-869)") {
    val df = Seq("42", "0x2a", "0xff", "0").toDF("s")
    val out = df.select(LogOps.parseU64(col("s")).as("v")).as[Long].collect()
    assert(out.toSeq == Seq(42L, 42L, 255L, 0L))
  }

  test("hex round-trip (F2) and topics CSV round-trip (F4)") {
    val df = Seq(("click", Seq("a", "b", "c"))).toDF("s", "arr")
    val r = df.select(
      LogOps.fromHex0x(LogOps.toHex0x(col("s"))).as("rt"),
      LogOps.topicsFromCsv(LogOps.topicsToCsv(col("arr"))).as("arr_rt"))
      .head()
    assert(r.getString(0) == "click")
    assert(r.getSeq[String](1) == Seq("a", "b", "c"))
  }

  test("tailWindow takes the top-k by height, descending (W5)") {
    val headers = (1L to 20L).map(i => (i, s"h$i")).toDF("block_num", "hash")
    val tail = LogOps.tailWindow(headers, 5)
      .select("block_num").as[Long].collect()
    assert(tail.toSeq == Seq(20L, 19L, 18L, 17L, 16L))
  }

  test("withAppendIndex is consecutive from base in the given order (W1)") {
    val df = Seq((5L, 0L), (3L, 1L), (5L, 1L), (1L, 0L))
      .toDF("block_num", "tx_index")
    val idx = LogOps.withAppendIndex(df, base = 10L,
      Seq(col("block_num"), col("tx_index")))
      .orderBy("indx")
      .select("indx", "block_num", "tx_index")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(idx.toSeq == Seq((10L, 1L, 0L), (11L, 3L, 1L),
      (12L, 5L, 0L), (13L, 5L, 1L)))
  }

  test("withAppendIndexRanged equals the window path, with no global sort") {
    // a shuffled multi-partition batch with distinct keys: the ranged
    // two-pass assignment must produce the identical (key -> indx) map as
    // the single-partition window it replaces
    val rnd = new scala.util.Random(3)
    val rows = rnd.shuffle((0 until 500).map { i =>
      (rnd.nextLong(1000), rnd.nextLong(10), f"0x$i%04x")
    }.distinct.toVector)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8))
      .toDF("block_num", "tx_index", "tx_hash")
    val keys = Seq(col("block_num"), col("tx_index"), col("tx_hash"))
    def asMap(out: org.apache.spark.sql.DataFrame) =
      out.select("block_num", "tx_index", "tx_hash", "indx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> r.getLong(3))
        .toMap
    val ranged = LogOps.withAppendIndexRanged(df, base = 42L, keys)
    assert(asMap(ranged) == asMap(LogOps.withAppendIndex(df, 42L, keys)))
    // with an explicit partition count (AQE coalesces the tiny test batch
    // otherwise) the assignment runs over a genuinely multi-partition
    // layout — nothing funnels the batch through one task — and still
    // produces the identical sequence
    val wide = LogOps.withAppendIndexRanged(df, 42L, keys, Some(8))
    assert(wide.rdd.getNumPartitions > 1,
      s"ranged path collapsed to ${wide.rdd.getNumPartitions} partition(s)")
    assert(asMap(wide) == asMap(ranged))
    // and the pre-assignment exchange is ranged, not single-partition
    val plan = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
  }
}
