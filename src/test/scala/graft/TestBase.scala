package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{BlockHeader, FilterConfig}
import graft.sync.Provider

/** Shared session (one JVM-wide via getOrCreate) + mock-chain fixtures —
  * the Scala twin of the reference's `testutil.MockClient`/`MockList`
  * (ref `tracker_test.go` deterministic-scenario layer).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/** Serializes temporary `spark.experimental.extraOptimizations` mutation
  * across suites: the session is JVM-shared and suites run in parallel,
  * so one suite's install-run-restore window must not erase another's
  * installed rule mid-test (SimJoinRewriteSpec ↔ RangeJoinRewriteSpec).
  */
object OptimizerLock

/** A mock block: `tag` determines the hash lineage (like the reference's
  * `Mock(0x30).Parent(0x2).Num(3)` — same height, different hash ⇒ fork).
  */
final case class MBlock(num: Long, tag: String, parentTag: String, nLogs: Int) {
  def hash: String = s"h$tag"
  def parentHash: String = s"h$parentTag"
  def header: BlockHeader = BlockHeader(num, hash, parentHash)
}

object MockChain {
  /** Linear chain 0..n−1 with `logsAt(num)` logs per block. */
  def linear(n: Long, logsAt: Long => Int): Seq[MBlock] =
    (0L until n).map(i => MBlock(i, i.toString, (i - 1).toString, logsAt(i)))

  /** Fork the top `depth` blocks of `chain` onto a new lineage (tag suffix
    * defaults to "F"; pass a generation-unique suffix when forking
    * repeatedly), optionally extending by `extend` new blocks.
    */
  def fork(chain: Seq[MBlock], depth: Int, extend: Int = 0,
      logsAt: Long => Int = _ => 1, suffix: String = "F"): Seq[MBlock] = {
    val keep = chain.dropRight(depth)
    val base = keep.last
    val forkStart = base.num + 1
    val forked = (0 until depth + extend).map { i =>
      val num = forkStart + i
      val pTag = if (i == 0) base.tag else s"${num - 1}$suffix"
      MBlock(num, s"$num$suffix", pTag, logsAt(num))
    }
    keep ++ forked
  }
}

/** Parquet-free in-memory provider over a mock chain; `capBlocks` mimics the
  * reference's `mockClientWithLimit` (rejects ranges spanning more than
  * `cap+1` blocks — ref `tracker_test.go:760-778`).
  */
class MockProvider(
    spark: SparkSession,
    chain: Seq[MBlock],
    capBlocks: Option[Long] = None
) extends Provider {
  import spark.implicits._

  private val byNum = chain.map(b => b.num -> b).toMap

  /** All logs of the canonical chain as one DataFrame. */
  def allLogs: DataFrame = logsOf(chain)

  private def logsOf(blocks: Seq[MBlock]): DataFrame =
    blocks.flatMap { b =>
      (0 until b.nLogs).map { i =>
        (i.toLong, s"tx-${b.hash}-$i", b.num, b.hash,
          s"a${b.num % 3}", Seq(s"sig${b.num % 2}"), "0x")
      }
    }.toDF("tx_index", "tx_hash", "block_num", "block_hash", "address",
      "topics", "data")

  private def applyFilter(df: DataFrame, filter: FilterConfig): DataFrame = {
    import org.apache.spark.sql.functions.col
    val afterAddr =
      if (filter.addresses.isEmpty) df
      else df.where(col("address").isin(filter.addresses: _*))
    filter.topics.zipWithIndex.foldLeft(afterAddr) {
      case (d, (Some(t), i)) =>
        d.where(org.apache.spark.sql.functions
          .element_at(col("topics"), i + 1) === t)
      case (d, (None, _)) => d
    }
  }

  override def getLogs(from: Long, to: Long, filter: FilterConfig): DataFrame = {
    require(from <= to, "from higher than to")
    capBlocks.foreach { cap =>
      if (to - from > cap)
        throw new Provider.TooManyResults(
          "query returned more than 10000 results")
    }
    import org.apache.spark.sql.functions.col
    applyFilter(allLogs.where(col("block_num").between(from, to)), filter)
  }

  override def getLogsByHash(blockHash: String, filter: FilterConfig): DataFrame = {
    import org.apache.spark.sql.functions.col
    applyFilter(allLogs.where(col("block_hash") === blockHash), filter)
  }

  override def getBlock(number: Long): Option[BlockHeader] =
    byNum.get(number).map(_.header)

  override def latestBlock(): BlockHeader = chain.last.header

  override def genesisHash(): String = chain.head.hash

  override def chainId(): String = "1337"
}
