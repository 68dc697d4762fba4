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

  // real fixtures, generated in-process: ImageIO writes genuine PNG/JPEG
  // containers; the WAV is the canonical 44-byte header + PCM silence
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def wavBytes(channels: Int, rate: Int, bits: Int,
      nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val byteRate = rate * blockAlign
    val dataSize = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  test("decodeImageMeta reads real PNG and JPEG headers") {
    val png = Multimodal.Codecs.decodeImageMeta(pngBytes(7, 5))
    assert(png.exists(m => m.format == "png" && m.width == 7 &&
      m.height == 5 && m.channels == 3))
    val jpg = Multimodal.Codecs.decodeImageMeta(jpegBytes(12, 4))
    assert(jpg.exists(m => m.format.startsWith("jp") && m.width == 12 &&
      m.height == 4))
    assert(Multimodal.Codecs.decodeImageMeta("not an image".getBytes).isEmpty)
    assert(Multimodal.Codecs.decodeImageMeta(Array.empty[Byte]).isEmpty)
  }

  test("decodeWavMeta parses the RIFF header and derives duration") {
    // 16 kHz stereo 16-bit, 8000 frames = 500 ms
    val w = Multimodal.Codecs.decodeWavMeta(wavBytes(2, 16000, 16, 8000))
    assert(w.contains(Multimodal.WavMeta(2, 16000, 16, 500L)))
    // truncated / non-RIFF bytes refuse to parse
    assert(Multimodal.Codecs.decodeWavMeta(wavBytes(2, 16000, 16, 8000)
      .take(20)).isEmpty)
    assert(Multimodal.Codecs.decodeWavMeta("RIFFxxxxJUNK".getBytes ++
      new Array[Byte](40)).isEmpty)
  }

  test("probeAll decodes real payloads and falls back for opaque bytes") {
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "image", pngBytes(9, 3), "image/png",
        -1, -1, -1L),
      Multimodal.MediaBlob(2L, "audio", wavBytes(1, 8000, 16, 4000),
        "audio/wav", -1, -1, -1L),
      Multimodal.MediaBlob(3L, "image", "just text bytes".getBytes,
        "image/fake", 64, 64, -1L)
    ).toDS()
    val probes = Multimodal.probeAll(blobs).collect().sortBy(_.media_id)
    assert(probes(0).decoded && probes(0).format == "png" &&
      probes(0).width == 9 && probes(0).height == 3 && probes(0).channels == 3)
    assert(probes(1).decoded && probes(1).format == "wav" &&
      probes(1).sample_rate == 8000 && probes(1).duration_ms == 500L)
    // undecodable: keeps the blob's declared metadata, flagged
    assert(!probes(2).decoded && probes(2).width == 64 &&
      probes(2).format == "unknown")
  }

  test("realFeature is a histogram of DECODED pixels, not container bytes") {
    // 4×2 image: 4 black pixels, 3 white, 1 mid-gray — luminance histogram
    // must be exactly (4/8 in bin 0, 1/8 in the gray bin, 3/8 in bin 7),
    // a distribution unreachable from any fold over the compressed bytes
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4) img.setRGB(x, 0, 0x000000)
    for (x <- 0 until 3) img.setRGB(x, 1, 0xffffff)
    img.setRGB(3, 1, 0x808080) // luma 128 -> bin 4 of 8
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.Codecs.realFeature(bos.toByteArray)
    assert(f.isDefined)
    assert(f.get.toSeq == Seq(0.5f, 0f, 0f, 0f, 0.125f, 0f, 0f, 0.375f))
    // and the same image re-encoded lossily still decodes to ~the same
    // histogram under the raster path (here: PNG is lossless, so exact)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos2)
    assert(Multimodal.Codecs.realFeature(bos2.toByteArray).get.toSeq ==
      f.get.toSeq)
  }

  test("realFeature bins real WAV PCM samples by amplitude") {
    // 6 PCM frames: 3 near-min, 2 at zero, 1 near-max
    val samples = Seq[Short](-32768, -32768, -32700, 0, 0, 32700)
    val base = wavBytes(1, 8000, 16, samples.length)
    val bb = java.nio.ByteBuffer.wrap(base)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(44)
    samples.foreach(bb.putShort)
    val f = Multimodal.Codecs.realFeature(base)
    assert(f.isDefined)
    // bins over [-32768, 32768): min→bin 0, 0→bin 4, +32700→bin 7
    assert(f.get.toSeq == Seq(0.5f, 0f, 0f, 0f, 1f / 3, 0f, 0f, 1f / 6))
    // undecodable payloads yield None (the stub fallback path)
    assert(Multimodal.Codecs.realFeature("opaque".getBytes).isEmpty)
  }

  test("extractFeatures routes decodable payloads through realFeature") {
    val png = pngBytes(3, 3) // 1 orange pixel + 8 black
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "image", png, "image/png", -1, -1, -1L),
      Multimodal.MediaBlob(2L, "image", "opaque".getBytes, "image/fake",
        -1, -1, -1L)
    ).toDS()
    val feats = Multimodal.extractFeatures(blobs).collect().sortBy(_.media_id)
    assert(feats(0).feature.toSeq ==
      Multimodal.Codecs.realFeature(png).get.toSeq)
    assert(feats(1).feature.toSeq ==
      Multimodal.Codecs.imageFeature("opaque".getBytes).toSeq)
  }

  test("features join back to metadata without shuffling payloads") {
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val joined = Multimodal.featureTable(media)
      .join(docs, col("media_id") === col("doc_id"))
    assert(joined.count() == 3)
  }
}
