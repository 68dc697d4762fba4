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

  test("resizeRaster: real area-average downscale with a stable pHash") {
    val src = Multimodal.Codecs.encodeBmp24(Multimodal.Codecs.tilePx(42L, tweak = false))
    val down = Multimodal.Codecs.resizeRaster(src, 16, 16).get
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(down))
    assert(img.getWidth == 16 && img.getHeight == 16)
    // box-downscaling a smooth raster preserves its low-frequency
    // structure: the perceptual hash moves only a few bits
    val d = java.lang.Long.bitCount(
      Multimodal.Codecs.pHash64(src).get ^
        Multimodal.Codecs.pHash64(down).get)
    assert(d <= 10, s"pHash moved $d bits under a 2x downscale")
    // upscale also real: exact dims, decodable
    val up = Multimodal.Codecs.resizeRaster(src, 64, 48).get
    val imgUp = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(up))
    assert(imgUp.getWidth == 64 && imgUp.getHeight == 48)
    // non-raster payloads have no raster resize (resize() stubs them)
    assert(Multimodal.Codecs.resizeRaster(
      "not an image".getBytes("UTF-8"), 8, 8).isEmpty)
  }

  test("keyFrames keep only shot boundaries of a real AVI") {
    val sceneA = Multimodal.Codecs.tilePx(1L, tweak = false).flatten
    val sceneB = Multimodal.Codecs.tilePx(999L, tweak = false).flatten
    val avi = aviBytes(32, 32, 40000,
      Seq(sceneA, sceneA, sceneA, sceneB, sceneB, sceneB))
    val kf = Multimodal.Codecs.keyFrames(avi, minDist = 8).get
    assert(kf.map(_._1) == Seq(0, 3),
      s"expected shot boundaries 0 and 3, got ${kf.map(_._1)}")
    // kept frames are REAL rasters (each pHash-decodable)
    assert(kf.forall { case (_, f) => Multimodal.Codecs.pHash64(f).isDefined })
    // Dataset form: generator shape, real frame numbers
    val blobs = Seq(Multimodal.MediaBlob(7L, "video", avi, "video/avi",
      32, 32, -1L)).toDS()
    val rows = Multimodal.keyFrames(blobs, minDist = 8).collect()
    assert(rows.map(r => (r.media_id, r.frame_no)).sorted.toSeq ==
      Seq((7L, 0), (7L, 3)))
    // non-AVI payloads emit nothing
    val junk = Seq(Multimodal.MediaBlob(8L, "video",
      "junk".getBytes("UTF-8"), "video/avi", 0, 0, -1L)).toDS()
    assert(Multimodal.keyFrames(junk).count() == 0L)
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

  // real uncompressed AVI, generated in-process: RIFF('AVI ') with an
  // hdrl LIST (avih + one 'vids' strl whose strf is a BGR24
  // BITMAPINFOHEADER) and a movi LIST of raw-DIB '00db' frames —
  // bottom-up rows, 4-byte-aligned, exactly what a real AVI muxer emits
  // for the BI_RGB profile
  private def aviBytes(w: Int, h: Int, usPerFrame: Int,
      frames: Seq[Array[Int]]): Array[Byte] =
    Multimodal.Codecs.encodeAvi(w, h, usPerFrame, frames)

  private val black = 0x000000
  private val white = 0xffffff
  private val gray = 0x808080 // luma 128 → bin 4 of 8

  test("decodeAviMeta parses real AVI structure: dims, frames, duration") {
    val avi = aviBytes(4, 2, 40000,
      Seq(Array.fill(8)(black), Array.fill(8)(white), Array.fill(8)(gray)))
    val m = Multimodal.Codecs.decodeAviMeta(avi)
    assert(m.contains(Multimodal.AviMeta(4, 2, 3, 40000L, 120L)))
    // truncated and non-AVI bytes refuse to parse
    assert(Multimodal.Codecs.decodeAviMeta(avi.take(40)).isEmpty)
    assert(Multimodal.Codecs.decodeAviMeta(
      wavBytes(1, 8000, 16, 100)).isEmpty)
  }

  test("AVI keyframe extraction yields REAL decodable frames") {
    val avi = aviBytes(4, 2, 40000,
      Seq(Array.fill(8)(black), Array.fill(8)(white), Array.fill(8)(gray)))
    val frames = Multimodal.Codecs.sampleFrames(avi, 3)
    assert(frames.length == 3)
    // each extracted frame is a standalone BMP whose DECODED pixels carry
    // the planted distribution — verified through the raster path, which
    // would be impossible for a byte-slice stub
    val hists = frames.map(f =>
      Multimodal.Codecs.rasterHistogram(f).get.toSeq)
    assert(hists(0) == Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)) // all black
    assert(hists(1) == Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f)) // all white
    assert(hists(2) == Seq(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)) // all gray
    // realFeature over the whole video = mean of the frame histograms
    val f = Multimodal.Codecs.realFeature(avi)
    assert(f.get.toSeq == Seq(1f / 3, 0f, 0f, 0f, 1f / 3, 0f, 0f, 1f / 3))
    // sampling fewer frames than exist picks evenly spaced REAL frames
    val two = Multimodal.Codecs.sampleFrames(avi, 2)
    assert(two.length == 2)
    assert(Multimodal.Codecs.rasterHistogram(two(0)).get.toSeq ==
      hists(0))
    // non-AVI bytes keep the deterministic stub path
    val stub = Multimodal.Codecs.sampleFrames("opaque bytes".getBytes, 2)
    assert(stub.map(_.toSeq) == Multimodal.Codecs
      .sampleFramesStub("opaque bytes".getBytes, 2).map(_.toSeq))
  }

  test("probeAll recognises AVI payloads") {
    val avi = aviBytes(6, 4, 33333, Seq(Array.fill(24)(black)))
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "video", avi, "video/avi", -1, -1, -1L)
    ).toDS()
    val p = Multimodal.probeAll(blobs).collect().head
    assert(p.decoded && p.format == "avi" && p.width == 6 && p.height == 4)
    assert(p.duration_ms == 33L) // 1 frame × 33333 µs
  }

  test("features join back to metadata without shuffling payloads") {
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val joined = Multimodal.featureTable(media)
      .join(docs, col("media_id") === col("doc_id"))
    assert(joined.count() == 3)
  }

  private def tilePx(seed: Long, tweak: Boolean = false): Array[Array[Int]] =
    Multimodal.Codecs.tilePx(seed, tweak)

  private def pngBytes(px: Array[Array[Int]]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, px(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("pHash: container-invariant, edit-tolerant, discriminative") {
    val px = tilePx(77L)
    val viaBmp = Multimodal.Codecs.pHash64(Multimodal.Codecs.encodeBmp24(px))
    val viaPng = Multimodal.Codecs.pHash64(pngBytes(px))
    assert(viaBmp.isDefined && viaBmp == viaPng,
      "same raster must hash identically under PNG and BMP")
    // a 5-pixel edit moves few bits; a different pattern moves many
    val edited = Multimodal.Codecs
      .pHash64(Multimodal.Codecs.encodeBmp24(tilePx(77L, tweak = true)))
    val other = Multimodal.Codecs
      .pHash64(Multimodal.Codecs.encodeBmp24(tilePx(4242L)))
    val dEdit = hamming(viaBmp.get, edited.get)
    val dOther = hamming(viaBmp.get, other.get)
    assert(dEdit <= 6, s"edited copy drifted $dEdit bits")
    assert(dOther > 16, s"unrelated image only $dOther bits away")
    // undecodable bytes have no perceptual identity
    assert(Multimodal.Codecs.pHash64("not an image".getBytes).isEmpty)
  }

  test("nearDupMedia finds every planted near-copy; extras are true near-hashes") {
    val table = (0 until 24)
      .map(i => (i.toLong, s"document number $i with its own words $i"))
      .toDF("doc_id", "text")
    val blobs = Multimodal.synthRasterBlobs(table, "doc_id", "text",
      plantEvery = 4)
    // bands = 8 (the declared dedup_media config): pigeonhole covers the
    // whole maxDist = 4 — 4×16-bit only guarantees distance ≤ 3
    val pairs = Multimodal.nearDupMedia(blobs, maxDist = 4, bands = 8)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    val planted = (0 until 24 by 4)
      .map(i => (i.toLong, i.toLong + 1000000L)).toSet
    planted.foreach(p =>
      assert(pairSet.contains(p), s"missed planted pair $p"))
    // extras can only be pHash near-collisions between genuinely
    // similar-looking patterns: verify each against the recomputed
    // fingerprints, and that they stay rare on this corpus
    val fps = Multimodal.perceptualHash(blobs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b, d) =>
      assert(hamming(fps(a), fps(b)) == d && d <= 4,
        s"pair ($a,$b) reports hamming $d vs ${hamming(fps(a), fps(b))}")
    }
    assert((pairSet -- planted).size <= 3,
      s"too many near-collisions: ${pairSet -- planted}")
  }

  test("videoFp64: majority vote over real frames — edit- and drop-tolerant") {
    def vid(seed: Long, tweak: Boolean, nFrames: Int = 4): Array[Byte] =
      Multimodal.Codecs.encodeAvi(32, 32, 40000,
        Multimodal.Codecs.motionFrames(seed, tweak, nFrames))
    val a = Multimodal.Codecs.videoFp64(vid(9L, tweak = false))
    assert(a.isDefined)
    val edited = Multimodal.Codecs.videoFp64(vid(9L, tweak = true))
    val dEdit = hamming(a.get, edited.get)
    assert(dEdit <= 8, s"per-frame-edited copy drifted $dEdit bits")
    val dropped = Multimodal.Codecs.videoFp64(vid(9L, tweak = false, nFrames = 3))
    val dDrop = hamming(a.get, dropped.get)
    assert(dDrop <= 12, s"dropped-frame copy drifted $dDrop bits")
    val other = Multimodal.Codecs.videoFp64(vid(777L, tweak = false))
    val dOther = hamming(a.get, other.get)
    assert(dOther > 12, s"unrelated video only $dOther bits away")
    assert(Multimodal.Codecs.videoFp64("not a video".getBytes).isEmpty)
  }

  test("nearDupMedia pairs planted video re-edits through the same ladder") {
    val table = (0 until 24)
      .map(i => (i.toLong, s"video document $i shooting its own scene $i"))
      .toDF("doc_id", "text")
    val blobs = Multimodal.synthVideoBlobs(table, "doc_id", "text",
      plantEvery = 4)
    val pairs = Multimodal.nearDupMedia(
        Multimodal.dedupExactMedia(blobs), maxDist = 7, bands = 8)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = (0 until 24 by 4)
      .map(i => (i.toLong, i.toLong + 1000000L)).toSet
    lazy val fps = Multimodal.perceptualHash(blobs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    planted.foreach(p => assert(pairs.contains(p),
      s"missed planted pair $p (hamming ${hamming(fps(p._1), fps(p._2))})"))
    assert((pairs -- planted).size <= 3,
      s"too many near-collisions: ${pairs -- planted}")
  }

  test("fingerprint index: a new batch pairs against the persisted corpus only") {
    val corpus = (0 until 12)
      .map(i => (i.toLong, s"indexed doc $i says something number $i"))
      .toDF("doc_id", "text")
    val corpusBlobs = Multimodal.synthRasterBlobs(corpus, "doc_id", "text",
      plantEvery = 1000) // no planted copies in the indexed corpus
    val path = tmpDir("fpidx")
    Multimodal.writeFpIndex(corpusBlobs, path)
    // the batch: one pixel-edited near-copy of indexed doc 3 + one novel
    val batch = Seq(
      Multimodal.MediaBlob(1000003L, "image",
        Multimodal.Codecs.encodeBmp24(Multimodal.Codecs.tilePx(
          "indexed doc 3 says something number 3".hashCode.toLong & 0xffffffffL,
          tweak = true)), "image/bmp", 32, 32, -1L),
      Multimodal.MediaBlob(555L, "image",
        Multimodal.Codecs.encodeBmp24(Multimodal.Codecs.tilePx(987654L,
          tweak = false)), "image/bmp", 32, 32, -1L))
    import spark.implicits._
    val pairs = Multimodal.candidatesAgainstFpIndex(batch.toDS(), path,
        maxDist = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSet == Set((3L, 1000003L)),
      s"expected only the planted near-copy pair, got ${pairs.toSeq}")
    // stream segment: a near-copy of indexed doc 5 arrives via the
    // STREAMING index writer; the next probe pairs against it too
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Multimodal.MediaBlob]
    val q = Multimodal.fpIndexStreamWriter(stream.toDS(), path,
      tmpDir("fpidx-ckpt"))
    stream.addData(Multimodal.MediaBlob(2000005L, "image",
      Multimodal.Codecs.encodeBmp24(Multimodal.Codecs.tilePx(
        "indexed doc 5 says something number 5".hashCode.toLong & 0xffffffffL,
        tweak = true)), "image/bmp", 32, 32, -1L))
    q.processAllAvailable(); q.stop()
    val probe5 = Seq(Multimodal.MediaBlob(3000005L, "image",
      Multimodal.Codecs.encodeBmp24(Multimodal.Codecs.tilePx(
        "indexed doc 5 says something number 5".hashCode.toLong & 0xffffffffL,
        tweak = false)), "image/bmp", 32, 32, -1L))
    val pairs2 = Multimodal.candidatesAgainstFpIndex(probe5.toDS(), path,
        maxDist = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    // the probe is doc 5's exact raster: it pairs with BOTH the batch-
    // indexed original (id 5) and the stream-indexed tweaked copy
    assert(pairs2 == Set((5L, 3000005L), (2000005L, 3000005L)),
      s"expected batch+stream segment pairs, got $pairs2")
  }

  test("audioFp64: scale-invariant, noise-tolerant, discriminative") {
    def tone(freqs: Seq[Double], scale: Double,
        noiseSeed: Option[Long]): Array[Byte] = {
      val rnd = noiseSeed.map(new scala.util.Random(_))
      val samples = Array.tabulate(4000) { i =>
        val v = freqs.map(f => math.sin(math.Pi * f * i)).sum *
          (0.6 + 0.4 * math.sin(2.0 * math.Pi * i / 4000.0))
        val nz = rnd.map(_.nextGaussian() * 30.0).getOrElse(0.0)
        math.max(-32768.0,
          math.min(32767.0, scale * v * 8000.0 + nz)).toShort
      }
      Multimodal.Codecs.encodeWav16(samples, 8000)
    }
    val a = Multimodal.Codecs.audioFp64(tone(Seq(0.1, 0.22, 0.4), 1.0, None))
    val half = Multimodal.Codecs.audioFp64(tone(Seq(0.1, 0.22, 0.4), 0.5, None))
    assert(a.isDefined)
    assert(a == half, "pure amplitude scaling must not move a single bit")
    val noisy = Multimodal.Codecs
      .audioFp64(tone(Seq(0.1, 0.22, 0.4), 0.7, Some(5L)))
    val dNoise = hamming(a.get, noisy.get)
    assert(dNoise <= 8, s"re-mastered copy drifted $dNoise bits")
    val other = Multimodal.Codecs.audioFp64(tone(Seq(0.07, 0.31, 0.45), 1.0, None))
    val dOther = hamming(a.get, other.get)
    assert(dOther > 12, s"unrelated tones only $dOther bits away")
    // non-WAV bytes have no audio identity
    assert(Multimodal.Codecs.audioFp64("not audio".getBytes).isEmpty)
  }

  test("nearDupMedia pairs planted audio re-masters through the same ladder") {
    val table = (0 until 24)
      .map(i => (i.toLong, s"audio document $i humming its own tune $i"))
      .toDF("doc_id", "text")
    val blobs = Multimodal.synthAudioBlobs(table, "doc_id", "text",
      plantEvery = 4)
    val pairs = Multimodal.nearDupMedia(
        Multimodal.dedupExactMedia(blobs), maxDist = 7, bands = 8)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = (0 until 24 by 4)
      .map(i => (i.toLong, i.toLong + 1000000L)).toSet
    lazy val fps = Multimodal.perceptualHash(blobs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    planted.foreach(p => assert(pairs.contains(p),
      s"missed planted pair $p (hamming ${hamming(fps(p._1), fps(p._2))})"))
    assert((pairs -- planted).size <= 3,
      s"too many near-collisions: ${pairs -- planted}")
  }

  test("nearDupAudioAmplified: OR of phase views, superset of phase 0") {
    val table = (0 until 24)
      .map(i => (i.toLong, s"audio document $i humming its own tune $i"))
      .toDF("doc_id", "text")
    val blobs = Multimodal.dedupExactMedia(
      Multimodal.synthAudioBlobs(table, "doc_id", "text", plantEvery = 4))
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val single = pairSet(Multimodal.nearDupMedia(blobs, maxDist = 7, bands = 8))
    val amp = pairSet(Multimodal.nearDupAudioAmplified(blobs, maxDist = 7))
    // OR-amplification can only ADD pairs over the primary phase
    assert(single.subsetOf(amp),
      s"amplified lost phase-0 pairs: ${single -- amp}")
    // with one phase it IS the primary tier (phase 0 is bit-identical)
    val onePhase = pairSet(
      Multimodal.nearDupAudioAmplified(blobs, maxDist = 7, phases = 1))
    assert(onePhase == single,
      s"single-phase amplified must equal nearDupMedia: " +
        s"${onePhase.diff(single)} / ${single.diff(onePhase)}")
    // every planted pair is recalled by the amplified tier here too
    val planted = (0 until 24 by 4)
      .map(i => (i.toLong, i.toLong + 1000000L)).toSet
    planted.foreach(p => assert(amp.contains(p), s"missed planted pair $p"))
    // hamming reports the MINIMUM across phases: never above the single
    // phase's distance for a shared pair
    val ampD = Multimodal.nearDupAudioAmplified(blobs, maxDist = 7).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    val singleD = Multimodal.nearDupMedia(blobs, maxDist = 7, bands = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    singleD.foreach { case (k, d0) =>
      assert(ampD(k) <= d0, s"min-hamming violated for $k: ${ampD(k)} > $d0")
    }
  }
}
