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
}
