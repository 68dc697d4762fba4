package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.functions.{Abi, EthFunctions}

/** Value-level verification of the schema-driven ABI decoder against an
  * INDEPENDENT encoder written here from the public contract-ABI spec
  * (head slots + offset-pointed tails) — the decode twin of the
  * reference's go-web3 `ParseLog` path (ref `README.md:28-34,95-104`).
  */
class AbiSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal ABI encoder for the test: static values occupy one 32-byte
    * slot; dynamic `bytes`/`string` put a tail offset in the slot and
    * append `[len][payload padded to 32]` to the tail.
    */
  private def abiEncode(params: Seq[Either[Array[Byte], BigInt]]): Array[Byte] = {
    val headLen = params.length * 32
    val tail = new scala.collection.mutable.ArrayBuffer[Byte]()
    def word(v: BigInt): Array[Byte] = {
      val out = new Array[Byte](32)
      val raw = v.toByteArray.dropWhile(_ == 0)
      raw.copyToArray(out, 32 - raw.length)
      out
    }
    val head = params.map {
      case Right(static) => word(static)
      case Left(dyn) =>
        val off = headLen + tail.length
        tail ++= word(BigInt(dyn.length))
        tail ++= dyn
        tail ++= new Array[Byte]((32 - dyn.length % 32) % 32)
        word(BigInt(off))
    }
    (head.flatten ++ tail).toArray
  }

  private def le(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  test("DepositEvent decode matches the reference README composition") {
    // 5 dynamic bytes fields, amount/index read as little-endian u64 after
    // decode — exactly the README's ParseLog + binary.LittleEndian.Uint64
    val pubkey = Array.tabulate[Byte](48)(i => (i + 1).toByte)
    val cred = Array.tabulate[Byte](32)(i => (0x40 + i).toByte)
    val amountBytes = le(32000000000L) // 32 ETH in gwei (deposit contract)
    val sigBytes = Array.tabulate[Byte](96)(i => (0x7f - i).toByte)
    val indexBytes = le(5L)
    val blob = abiEncode(Seq(Left(pubkey), Left(cred), Left(amountBytes),
      Left(sigBytes), Left(indexBytes)))

    val sig = """DepositEvent(
      bytes pubkey,
      bytes whitdrawalcred,
      bytes amount,
      bytes signature,
      bytes index)"""
    val dec = Abi.decode(col("data"), sig)
    val r = Seq(Tuple1(blob)).toDF("data")
      .select(dec.as("ev"))
      .select(col("ev.pubkey"), col("ev.whitdrawalcred"),
        EthFunctions.le_u64(col("ev.amount"), lit(0L)).as("amount"),
        col("ev.signature"),
        EthFunctions.le_u64(col("ev.index"), lit(0L)).as("index"))
      .collect().head
    assert(r.getAs[Array[Byte]]("pubkey").toSeq == pubkey.toSeq)
    assert(r.getAs[Array[Byte]]("whitdrawalcred").toSeq == cred.toSeq)
    assert(r.getAs[Long]("amount") == 32000000000L)
    assert(r.getAs[Array[Byte]]("signature").toSeq == sigBytes.toSeq)
    assert(r.getAs[Long]("index") == 5L)
  }

  test("static/dynamic mix: address, uint64, bool, bytes32, string") {
    val addr = Array.tabulate[Byte](20)(i => (0xa0 + i).toByte)
    val b32 = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val memo = "hello abi".getBytes("UTF-8")
    val blob = abiEncode(Seq(
      Right(BigInt(1, addr)),           // address (right-aligned)
      Right(BigInt(123456789L)),        // uint64
      Right(BigInt(1)),                 // bool true
      Right(BigInt(0)),                 // bytes32 placeholder (patched below)
      Left(memo)))                      // string
    // fixed-size bytesN is LEFT-aligned in its slot (unlike numbers, which
    // the encoder right-aligns) — write the bytes32 word directly
    val fixed = blob.clone()
    b32.copyToArray(fixed, 96)

    val dec = Abi.decode(col("data"),
      "Ev(address a, uint64 n, bool f, bytes32 h, string s)")
    val r = Seq(Tuple1(fixed)).toDF("data").select(dec.as("ev"))
      .select("ev.a", "ev.n", "ev.f", "ev.h", "ev.s").collect().head
    assert(r.getAs[String]("a") == addr.map("%02x".format(_)).mkString)
    assert(r.getAs[Long]("n") == 123456789L)
    assert(r.getAs[Boolean]("f"))
    assert(r.getAs[String]("h") == b32.map("%02x".format(_)).mkString)
    assert(r.getAs[String]("s") == "hello abi")
  }

  test("indexed params are skipped; topic0 is keccak of canonical signature") {
    val ev = Abi.parseEvent(
      "Transfer(address indexed from, address indexed to, uint256 value)")
    assert(ev.canonicalSignature == "Transfer(address,address,uint256)")
    assert(ev.dataFields.map(_.name) == Seq("value"))
    // the canonical ERC-20 topic (public vector, also in EthFunctionsSpec)
    val topic = Seq(1).toDF("x").select(Abi.topic0(
      "Transfer(address indexed from, address indexed to, uint256 value)"))
      .collect().head.getString(0)
    assert(topic ==
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    // uint256 decodes losslessly as the raw 64-hex word
    val big = BigInt("123456789012345678901234567890")
    val blob = abiEncode(Seq(Right(big)))
    val v = Seq(Tuple1(blob)).toDF("data")
      .select(Abi.decode(col("data"),
        "Transfer(address indexed from, address indexed to, uint256 value)")
        .getField("value").as("v")).collect().head.getString(0)
    assert(BigInt(v, 16) == big)
  }

  test("decodeTopics reads indexed params; dynamic indexed stay hashed") {
    // ERC-20 Transfer: both addresses indexed, value in data
    val from = Array.tabulate[Byte](20)(i => (0x10 + i).toByte)
    val to = Array.tabulate[Byte](20)(i => (0x30 + i).toByte)
    def topicOf(addr: Array[Byte]) =
      "0x" + "0" * 24 + addr.map("%02x".format(_)).mkString
    val sig =
      "Transfer(address indexed from, address indexed to, uint256 value)"
    val df = Seq(Tuple1(Seq(
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef",
      topicOf(from), topicOf(to)))).toDF("topics")
    val r = df.select(Abi.decodeTopics(col("topics"), sig).as("t"))
      .select("t.from", "t.to").collect().head
    assert(r.getString(0) == from.map("%02x".format(_)).mkString)
    assert(r.getString(1) == to.map("%02x".format(_)).mkString)
    // indexed uint64 + bool decode as typed values
    val sig2 = "Ev(uint64 indexed n, bool indexed f, string s)"
    val tN = "0x" + "0" * 48 + "00000000000004d2" // 1234
    val tF = "0x" + "0" * 63 + "1"
    val r2 = Seq(Tuple1(Seq("0xsig", tN, tF))).toDF("topics")
      .select(Abi.decodeTopics(col("topics"), sig2).as("t"))
      .select("t.n", "t.f").collect().head
    assert(r2.getLong(0) == 1234L)
    assert(r2.getBoolean(1))
    // indexed string: the topic is the keccak hash of the value — decoded
    // as the raw 64-hex word, matchable via keccak256
    val sig3 = "Ev(string indexed tag, uint64 v)"
    val hashed = graft.functions.Keccak.hash256Hex("hello".getBytes("UTF-8"))
    val r3 = Seq(Tuple1(Seq("0xsig", "0x" + hashed))).toDF("topics")
      .select(Abi.decodeTopics(col("topics"), sig3).getField("tag"))
      .collect().head.getString(0)
    assert(r3 == hashed)
    // a SHORT topics array (malformed log) yields nulls, not a job-killing
    // ANSI out-of-bounds error
    val r4 = Seq(Tuple1(Seq("0xsig", tN))).toDF("topics")
      .select(Abi.decodeTopics(col("topics"), sig2).as("t"))
      .select("t.n", "t.f").collect().head
    assert(r4.getLong(0) == 1234L)
    assert(r4.isNullAt(1))
  }

  test("truncated blobs decode to nulls, not ANSI job kills") {
    // a 3-byte "blob": every slot read slices past the end → empty slice →
    // conv(hex('')) is null → null fields; the dynamic pointer chain
    // propagates the null. Malformed DATA degrades per-row; only malformed
    // SCHEMAS throw (at plan build).
    val r = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("data")
      .select(Abi.decode(col("data"),
        "E(uint64 a, address b, bytes c)").as("ev"))
      .select("ev.a", "ev.b", "ev.c").collect().head
    assert(r.isNullAt(0))
    assert(r.getString(1) == "") // empty slice hex — still a value, not a crash
    assert(r.isNullAt(2))
  }

  test("malformed signatures fail loudly") {
    intercept[IllegalArgumentException](Abi.parseEvent("NoParens"))
    intercept[IllegalArgumentException](Abi.parseEvent("E(uint64 a b c)"))
    // unknown types surface at decode compile time, not as bad data
    intercept[IllegalArgumentException](
      Abi.decode(lit(Array.emptyByteArray), "E(dragon x)"))
    // bytesN outside 1..32 does not exist in the ABI — rejecting it beats
    // silently slicing into the next field's slot
    intercept[IllegalArgumentException](
      Abi.decode(lit(Array.emptyByteArray), "E(bytes33 x, uint64 y)"))
    intercept[IllegalArgumentException](
      Abi.decode(lit(Array.emptyByteArray), "E(bytes0 x)"))
    intercept[IllegalArgumentException](
      Abi.decode(lit(Array.emptyByteArray),
        "E(uint64 indexed a)")) // nothing left in data
  }
}
