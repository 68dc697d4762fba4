package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Streaming IVF index maintenance (Similarity.ivfStreamWriter): vectors
  * arriving on a stream get their cell from broadcast centroids and land in
  * a cell-partitioned parquet table — the index is queryable mid-ingest and
  * a probe partition-prunes to its cells.
  */
class StreamAnnSpec extends SparkSpec {
  import spark.implicits._

  test("streamed vectors land cell-partitioned and probe-consistent") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(5)
    val centers = (0 until 4).map(_ => Array.fill(16)(rnd.nextGaussian()))
    def vec(i: Int): Seq[Float] =
      centers(i % 4).map(x => (x + 0.1 * rnd.nextGaussian()).toFloat).toSeq
    val all = (0 until 80).map(i => (i.toLong, vec(i)))

    // fit once on a "historical" sample (driver-local, deterministic)
    val centroids = {
      val hist = all.take(40).toDF("vec_id", "embedding")
      Similarity.ivfIndex(hist, "vec_id", "embedding", nlist = 4)._2
    }

    val path = tmpDir("ann-table")
    val ckpt = tmpDir("ann-ckpt")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.ivfStreamWriter(in.toDF.toDF("vec_id", "embedding"),
      centroids, "embedding", path, ckpt)
    in.addData(all.take(40))
    q.processAllAvailable()
    in.addData(all.drop(40)) // second micro-batch — index stays live
    q.processAllAvailable()
    q.stop()

    val table = spark.read.parquet(path)
    assert(table.count() == 80)
    // cells match a batch recompute with the same broadcast centroids
    val streamed = table.select("vec_id", "ivf_cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = all.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.VectorFunctions
          .nearestCentroid(col("embedding"), centroids).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)
    // the table is physically cell-partitioned and a probe partition-prunes
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ivf_cell="))
    assert(dirs.length >= 2, s"expected cell dirs, got ${dirs.toSeq}")
    val probed = Similarity.ivfTopK(table, centroids,
      all.head._2.toArray, "vec_id", "embedding", nprobe = 1, k = 5)
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"),
      "probe does not partition-prune")
    assert(probed.collect().length == 5)
  }

  test("streaming IVF-PQ composite: codes + cells on the stream, good recall") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(9)
    val centers = (0 until 4).map(_ => Array.fill(32)(rnd.nextGaussian()))
    def vec(i: Int): Seq[Float] =
      centers(i % 4).map(x => (x + 0.1 * rnd.nextGaussian()).toFloat).toSeq
    val all = (0 until 120).map(i => (i.toLong, vec(i)))
    val hist = all.take(60).toDF("vec_id", "embedding")
    val centroids = Similarity.ivfIndex(hist, "vec_id", "embedding",
      nlist = 4)._2
    val codebooks = Similarity.pqIndex(hist, "vec_id", "embedding",
      m = 8, k = 8)._2

    val path = tmpDir("ivfpq-table")
    val ckpt = tmpDir("ivfpq-ckpt")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.ivfPqStreamWriter(in.toDF.toDF("vec_id", "embedding"),
      centroids, codebooks, "embedding", path, ckpt)
    in.addData(all.take(60))
    q.processAllAvailable()
    in.addData(all.drop(60))
    q.processAllAvailable()
    q.stop()

    val table = spark.read.parquet(path)
    assert(table.count() == 120)
    assert((0 until 8).forall(j => table.columns.contains(s"pq_$j")))
    val full = all.toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(full,
      full.where(col("vec_id") === 0), "vec_id", "embedding", k = 10)
      .collect().map(_.getLong(0)).toSet
    val got = Similarity.ivfPqTopK(table, centroids, codebooks,
      all.head._2.toArray, "vec_id", "embedding", nprobe = 2, k = 10,
      rerank = 40).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF-PQ recall $recall too low")
  }

  test("streamed multi-table LSH index: probes are bit-identical to the " +
    "batch-built index on the same vectors") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val centers = (0 until 4).map(_ => Array.fill(16)(rnd.nextGaussian()))
    def vec(i: Int): Seq[Float] =
      centers(i % 4).map(x => (x + 0.2 * rnd.nextGaussian()).toFloat).toSeq
    val all = (0 until 100).map(i => (i.toLong, vec(i)))

    val sPath = tmpDir("lshmt-stream")
    val ckpt = tmpDir("lshmt-stream-ckpt")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.lshMtStreamWriter(in.toDF.toDF("vec_id", "embedding"),
      "vec_id", "embedding", sPath, ckpt, dim = 16, nbits = 4, tables = 4)
    in.addData(all.take(60))
    q.processAllAvailable()
    in.addData(all.drop(60)) // second micro-batch — index stays live
    q.processAllAvailable()
    q.stop()

    val bPath = tmpDir("lshmt-batch-ref")
    Similarity.writeLshMultiTableIndex(all.toDF("vec_id", "embedding"),
      "vec_id", "embedding", bPath, dim = 16, nbits = 4, tables = 4)

    val sIdx = spark.read.parquet(sPath)
    val bIdx = spark.read.parquet(bPath)
    assert(sIdx.count() == all.size * 4)
    // identical (id, key) placement — the deterministic-planes claim.
    // (cast: the streaming sink reads lsh_key back LONG from its
    // _spark_metadata schema, the batch read INFERS int from dir names)
    def placement(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("lsh_key").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(placement(sIdx) == placement(bIdx))
    // probe-result bit-identity, query-directed probing
    def bits(r: org.apache.spark.sql.Row) =
      (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))
    Seq(0L, 33L, 99L).foreach { qid =>
      val a = Similarity.annTopKMultiTable(sIdx, all(qid.toInt)._2.toArray,
        "vec_id", "embedding", dim = 16, nbits = 4, tables = 4, k = 8,
        probeHamming = 0, probeBudget = 3).collect().map(bits).toSeq
      val b = Similarity.annTopKMultiTable(bIdx, all(qid.toInt)._2.toArray,
        "vec_id", "embedding", dim = 16, nbits = 4, tables = 4, k = 8,
        probeHamming = 0, probeBudget = 3).collect().map(bits).toSeq
      assert(a == b, s"streamed-index probe diverged for query $qid")
    }
  }

  test("embedding band index: incremental probe equals the one-shot pair join") {
    val rnd = new scala.util.Random(29)
    val centers = (0 until 4).map(_ => Array.fill(16)(rnd.nextGaussian()))
    def vec(i: Int): Seq[Float] =
      centers(i % 4).map(x => (x + 0.2 * rnd.nextGaussian()).toFloat).toSeq
    val old = (0 until 60).map(i => (i.toLong, vec(i)))
    val fresh = (100 until 120).map(i => (i.toLong, vec(i)))
    val path = tmpDir("embband")

    Similarity.writeEmbBandIndex(old.toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, dim = 16, nbits = 4, tables = 4)
    val got = Similarity.candidatesAgainstEmbIndex(
        fresh.toDF("vec_id", "embedding"), "vec_id", "embedding", path,
        dim = 16, nbits = 4, tables = 4, minCosine = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle: the one-shot banded pair join over the union, restricted to
    // cross (old, new) pairs — same planes, same tables, same threshold
    val expected = graft.ext.Dedup.embeddingNearDup(
        (old ++ fresh).toDF("vec_id", "embedding"), "vec_id", "embedding",
        dim = 16, nbits = 4, minCosine = 0.3, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a < 100) != (b < 100) }.toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no cross near-dup pairs")
  }

  test("embedding band index: streamed segment is probed together with the batch segment") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val base = Array.fill(16)(rnd.nextGaussian())
    def near(i: Int): Seq[Float] =
      base.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq
    val path = tmpDir("embband2")
    val ckpt = tmpDir("embband2-ckpt")
    // batch segment: ids 0..9; stream segment: ids 50..59 — all near `base`
    Similarity.writeEmbBandIndex(
      (0 until 10).map(i => (i.toLong, near(i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, dim = 16, nbits = 4, tables = 4)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.embBandIndexStreamWriter(
      in.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
      path, ckpt, dim = 16, nbits = 4, tables = 4)
    in.addData((50 until 60).map(i => (i.toLong, near(i))))
    q.processAllAvailable()
    q.stop()
    // the index is (tbl, bucket)-partitioned on disk
    val dirs = new java.io.File(s"$path/batch").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("tbl=")))
    // a probe batch near `base` must pair with BOTH segments' vectors
    val got = Similarity.candidatesAgainstEmbIndex(
        Seq((200L, near(200))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", path,
        dim = 16, nbits = 4, tables = 4, minCosine = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert((got.intersect((0L until 10L).toSet)).nonEmpty)
    assert((got.intersect((50L until 60L).toSet)).nonEmpty)
  }
}
