package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Incremental dedup against a persisted LSH band index
  * (Dedup.writeBandIndex / bandIndexStreamWriter / candidatesAgainstIndex):
  * the 100 TB ingest pattern — index the corpus once, join each new batch
  * against the index instead of re-pairing the corpus.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private def corpus(ids: Range, dupEvery: Int) = ids.map { i =>
    if (i % dupEvery == 0) (i.toLong, base + s" tail${i % 3}")
    else (i.toLong, s"doc $i with its own unrelated words alpha$i beta$i gamma$i delta$i epsilon$i")
  }

  test("streamed band rows equal the batch index; incremental candidates match full LSH") {
    implicit val sql = spark.sqlContext
    val old = corpus(0 until 30, 5)
    val fresh = corpus(30 until 45, 5)
    val all = old ++ fresh

    // 1. batch-index the historical corpus
    val path = tmpDir("band-index")
    val ckpt = tmpDir("band-ckpt")
    Dedup.writeBandIndex(old.toDF("doc_id", "text"), "doc_id", "text", path)

    // 2. stream the new batch into the same index layout
    val in = MemoryStream[(Long, String)]
    val q = Dedup.bandIndexStreamWriter(in.toDF.toDF("doc_id", "text"),
      "doc_id", "text", path, ckpt)
    in.addData(fresh.take(7))
    q.processAllAvailable()
    in.addData(fresh.drop(7)) // second micro-batch — index stays live
    q.processAllAvailable()
    q.stop()

    // streamed rows must be IDENTICAL to a batch recompute (the lambda-form
    // signature equals the distinct-shingle aggregation: min ignores dups);
    // reading BOTH segments — the stream sink's metadata log owns only its
    // own segment dir
    val streamed = Seq(s"$path/batch", s"$path/stream")
      .map(p => spark.read.parquet(p).select("doc", "band", "band_hash"))
      .reduce(_ unionByName _)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batch = Dedup.bandRows(all.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch)

    // 3. incremental candidates (new batch vs index) == full-corpus LSH
    //    pairs restricted to those touching a new doc
    val newIds = fresh.map(_._1).toSet
    val incremental = Dedup.candidatesAgainstIndex(
        fresh.toDF("doc_id", "text"), "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minHashCandidates(all.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => newIds.contains(p._1) || newIds.contains(p._2))
    assert(incremental == full)
    assert(incremental.nonEmpty) // planted near-dups span old and new
  }
}
