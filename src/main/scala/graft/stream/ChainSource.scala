package graft.stream

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 streaming source for a block-log chain with AIMD rate
  * control — the Spark-native form of the reference's rate-limited
  * `eth_getLogs` range scan (SURVEY.md §4 custom-code item 2; ref
  * `tracker.go:327-394`).
  *
  * Mechanics:
  *  - offsets are block heights; each micro-batch admits an adaptively-sized
  *    block range `[lastCommitted+1, lastCommitted+batchSize]`;
  *  - if the *previous* batch exceeded `maxLogsPerBatch` the admitted range
  *    halves (multiplicative decrease, ref `tracker.go:356`); after a
  *    compliant batch it grows by 10% of the configured size, capped
  *    (additive increase, ref `tracker.go:342, 391-394`);
  *  - partition planning splits the admitted range per core; readers
  *    synthesize log rows deterministically from the block height (the
  *    harness "chain"; a production impl swaps the reader's row source for
  *    an RPC client — offsets/AIMD/planning are unchanged).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.stream.ChainSourceProvider")
  *     .option("headBlock", 500).option("batchSize", 100)
  *     .option("maxLogsPerBatch", 200).load()
  * }}}
  */
class ChainSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChainSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChainTable(new CaseInsensitiveStringMap(properties))
}

object ChainSource {
  val schema: StructType = StructType(Seq(
    StructField("block_num", LongType),
    StructField("block_hash", StringType),
    StructField("tx_index", LongType),
    StructField("tx_hash", StringType),
    StructField("address", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("data", StringType)
  ))

  /** Deterministic logs of one block (2 even / 5 odd — mirrors the AIMD
    * test fixture of the reference, `tracker_test.go:784-795`).
    */
  def logsOf(block: Long): Seq[InternalRow] = {
    val n = if (block % 2 == 0) 2 else 5
    (0 until n).map { i =>
      new GenericInternalRow(Array[Any](
        block,
        UTF8String.fromString(s"h$block"),
        i.toLong,
        UTF8String.fromString(s"tx-$block-$i"),
        UTF8String.fromString(s"a${block % 3}"),
        new GenericArrayData(Array[Any](
          UTF8String.fromString(s"sig${block % 2}"))),
        UTF8String.fromString("0x")
      ))
    }
  }

  def logCount(from: Long, to: Long): Long =
    (from to to).map(b => if (b % 2 == 0) 2L else 5L).sum
}

final class ChainTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_chain"
  override def schema(): StructType = ChainSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChainSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChainMicroBatchStream(
          headBlock = opts.getLong("headBlock", options.getLong("headBlock", 100L)),
          configuredBatch = opts.getLong("batchSize", options.getLong("batchSize", 100L)),
          maxLogsPerBatch = opts.getLong("maxLogsPerBatch", options.getLong("maxLogsPerBatch", Long.MaxValue)),
          numPartitions = opts.getInt("numPartitions", options.getInt("numPartitions", 4)))
    }
}

final case class BlockOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

/** AIMD admission control lives here: `latestOffset` decides how much of the
  * chain the next micro-batch may consume.
  */
final class ChainMicroBatchStream(
    headBlock: Long,
    configuredBatch: Long,
    maxLogsPerBatch: Long,
    numPartitions: Int
) extends MicroBatchStream with SupportsTriggerAvailableNow {

  // driver-side control state (exactly the reference's sync-loop locals)
  private var batchSize: Long = configuredBatch
  private var lastPlanned: Long = -1L

  override def initialOffset(): Offset = BlockOffset(-1L)

  /** AIMD admission: one call per micro-batch, given where the last batch
    * ended. Multiplicative decrease happens BEFORE admission — the planned
    * range shrinks until it fits the cap (the reference reacts to the
    * server's overflow error; an admission controller predicts from the
    * known per-block rate) — additive +10% recovery after.
    */
  private def admit(committed: Long): BlockOffset = {
    val from = committed + 1
    if (from > headBlock) BlockOffset(committed)
    else {
      while (batchSize > 1 &&
        ChainSource.logCount(from, math.min(headBlock, from + batchSize - 1)) > maxLogsPerBatch) {
        batchSize = math.max(1L, batchSize / 2)
      }
      val to = math.min(headBlock, from + batchSize - 1)
      lastPlanned = to
      batchSize = math.min(configuredBatch,
        batchSize + math.max(1L, configuredBatch / 10))
      BlockOffset(to)
    }
  }

  override def latestOffset(): Offset = admit(lastPlanned)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    admit(start.asInstanceOf[BlockOffset].block)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def prepareForTriggerAvailableNow(): Unit = ()

  /** AvailableNow runs micro-batches until this offset is reached. */
  override def reportLatestOffset(): Offset = BlockOffset(headBlock)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[BlockOffset].block + 1
    val to = end.asInstanceOf[BlockOffset].block
    if (from > to) Array.empty
    else {
      val span = to - from + 1
      val per = math.max(1L, (span + numPartitions - 1) / numPartitions)
      (from to to by per).map(s =>
        ChainInputPartition(s, math.min(to, s + per - 1)): InputPartition
      ).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChainInputPartition]
      new PartitionReader[InternalRow] {
        private val rows = (p.from to p.to).iterator
          .flatMap(ChainSource.logsOf)
        private var current: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) { current = rows.next(); true } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    BlockOffset(json.toLong)
}

final case class ChainInputPartition(from: Long, to: Long)
    extends InputPartition
