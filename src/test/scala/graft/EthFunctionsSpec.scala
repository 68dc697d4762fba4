package graft

import org.apache.spark.sql.functions._

import graft.functions.{EthFunctions, Keccak}

class EthFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("keccak256 matches the published test vectors") {
    // public Keccak-256 vectors (keccak.team / Ethereum yellow paper)
    assert(Keccak.hash256Hex(Array.emptyByteArray) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(Keccak.hash256Hex("abc".getBytes("UTF-8")) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // the canonical ERC-20 Transfer event topic
    assert(Keccak.hash256Hex("Transfer(address,address,uint256)".getBytes("UTF-8")) ==
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }

  test("KeccakHash expression evaluates inside a plan (codegen path)") {
    val df = Seq("abc", "Transfer(address,address,uint256)").toDF("s")
    val out = df.select(EthFunctions.keccak256(col("s")).as("h"))
      .as[String].collect().toSeq
    assert(out == Seq(
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"))
  }

  test("le_u64 decodes little-endian longs at offsets") {
    val payload = Array[Byte](
      1, 0, 0, 0, 0, 0, 0, 0,          // 1
      0x39, 0x30, 0, 0, 0, 0, 0, 0)    // 12345
    val df = Seq(Tuple1(payload)).toDF("data")
    val r = df.select(
      EthFunctions.le_u64(col("data"), lit(0L)).as("a"),
      EthFunctions.le_u64(col("data"), lit(8L)).as("b"),
      EthFunctions.le_u64(col("data"), lit(12L)).as("tail") // crosses end
    ).collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 12345L)
    assert(r.getLong(2) == 0L) // bytes 12..15 are zero, rest out of range
  }

  test("registerAll makes the expressions SQL-callable") {
    graft.functions.EthFunctions.registerAll(spark)
    Seq("abc").toDF("s").createOrReplaceTempView("sqltest")
    val h = spark.sql("SELECT keccak256(s) FROM sqltest").as[String].head()
    assert(h ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    val v = spark.sql(
      "SELECT le_u64(cast(X'2a00000000000000' AS BINARY), 0L)")
      .collect().head.getLong(0)
    assert(v == 42L)
  }

  test("eventTopic constant-folds to the signature hash") {
    val df = Seq(1).toDF("x")
    val topic = df.select(EthFunctions.eventTopic("Transfer(address,address,uint256)"))
      .as[String].collect().head
    assert(topic ==
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }
}
