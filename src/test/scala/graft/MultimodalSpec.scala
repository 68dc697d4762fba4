package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a small fake image payload"),
    (2L, "another payload with different bytes"),
    (3L, "a small fake image payload") // identical to 1
  ).toDF("doc_id", "text")

  test("binary plumbing: text → blobs → features, schema intact") {
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val feats = Multimodal.featureTable(media)
    assert(feats.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "sha", "feature"))
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 3)
    // deterministic: identical payloads → identical sha + feature
    assert(rows(0).getString(3) == rows(2).getString(3))
    assert(rows(0).getSeq[Float](4) == rows(2).getSeq[Float](4))
    assert(rows(0).getString(3) != rows(1).getString(3))
    assert(rows(0).getSeq[Float](4).length == Multimodal.Codecs.FeatureDim)
  }

  test("resize keeps ids and shrinks payloads") {
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val resized = Multimodal.resizeAll(media, 32, 32)
    val r = resized.collect().sortBy(_.media_id)
    assert(r.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(r.forall(m => m.width == 32 && m.height == 32))
    assert(r.forall(_.content.length <= 36))
  }

  test("frame sampling is a generator: n rows per media") {
    val media = Multimodal.fromText(docs, "doc_id", "text", kind = "video")
    val frames = Multimodal.sampleFrames(media, 4)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId.values.forall(_.length == 4))
    assert(byId(1L).map(_.frame_no).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("features join back to metadata without shuffling payloads") {
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val joined = Multimodal.featureTable(media)
      .join(docs, col("media_id") === col("doc_id"))
    assert(joined.count() == 3)
  }
}
