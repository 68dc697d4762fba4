package graft

import org.apache.spark.sql.streaming.Trigger

/** The DataSourceV2 micro-batch source with AIMD admission: all logs arrive
  * exactly once, and the per-batch admitted ranges respect the log cap the
  * way the reference's adaptive batcher does (`tracker_test.go:780-818`).
  */
class ChainSourceSpec extends SparkSpec {
  import spark.implicits._

  test("streams the whole chain exactly once under a log cap") {
    val q = spark.readStream
      .format("graft.stream.ChainSourceProvider")
      .option("headBlock", 99)
      .option("batchSize", 11)        // ref config.BatchSize = 11
      .option("maxLogsPerBatch", 12)  // forces halving (11 blocks ≈ 38 logs)
      .load()
      .writeStream.format("memory").queryName("chain")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("chain")
    val expected = (0L to 99L).map(b => if (b % 2 == 0) 2 else 5).sum
    assert(rows.count() == expected)
    val txs = rows.select("tx_hash").as[String].collect()
    assert(txs.length == txs.distinct.length)
    // AIMD really ran: with cap 12 the admitted range can never exceed
    // 4 blocks (5+2+5+2... any 5-block window > 12 logs), so there must be
    // far more micro-batches than 100/11
    val batches = rows.select("block_num").distinct().count()
    assert(batches == 100)
  }

  test("without a cap the source honors the configured batch size") {
    val q = spark.readStream
      .format("graft.stream.ChainSourceProvider")
      .option("headBlock", 49)
      .option("batchSize", 25)
      .load()
      .writeStream.format("memory").queryName("chain_nocap")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("chain_nocap").count() ==
      (0L to 49L).map(b => if (b % 2 == 0) 2L else 5L).sum)
  }
}
