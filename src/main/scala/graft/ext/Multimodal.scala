package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing here is real and tested — schema, typed Datasets,
  * batch shape, partitioning. Codec depth is tiered:
  *  - REAL header decoding for PNG/JPEG (JDK ImageIO, header-only — the
  *    raster is never materialized) and WAV (RIFF chunk walk) via
  *    [[Codecs.decodeImageMeta]] / [[Codecs.decodeWavMeta]], surfaced by
  *    [[probeAll]] with a null-safe fallback for undecodable bytes.
  *  - REAL content decoding for the zero-dependency codecs: full-raster /
  *    PCM / uncompressed-AVI-frame featurization
  *    ([[Codecs.realFeature]]) and actual keyframe extraction for AVI
  *    ([[Codecs.decodeAviFrames]] — each frame re-wrapped as a
  *    standalone BMP so downstream image steps run on frames unchanged).
  *  - STUBBED model-dependent steps (model featurize for undecodable
  *    bytes, re-encode, non-AVI keyframes) behind [[Codecs]] with
  *    deterministic fakes — those need ML models / compressed-video
  *    codecs this container doesn't ship. Swapping one in is a
  *    one-function change; nothing in the pipeline shape moves.
  *
  * Scale design: media blobs are large and must never be shuffled casually —
  * every operator below is a narrow `mapPartitions` (the Scala analog of
  * `mapInPandas`: one iterator pass, batched, no per-row serialization
  * overhead), and derived features are small rows that CAN be shuffled/
  * joined freely. Partition media by (kind, size-bucket) at rest so decode
  * cost per task is uniform.
  */
object Multimodal {

  /** One media row: the opaque payload + typed metadata. */
  final case class MediaBlob(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      content: Array[Byte],
      mime: String,
      width: Int,              // images/video; -1 when n/a
      height: Int,
      duration_ms: Long        // audio/video; -1 when n/a
  )

  /** Extracted features: small, shuffle-friendly. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      feature: Array[Float]    // embedding-shaped output, fixed dim
  )

  final case class Frame(media_id: Long, frame_no: Int, content: Array[Byte])

  /** Real container metadata, from actually parsing the payload bytes. */
  final case class ImageMeta(format: String, width: Int, height: Int,
      channels: Int)
  final case class WavMeta(channels: Int, sample_rate: Int,
      bits_per_sample: Int, duration_ms: Long)
  final case class AviMeta(width: Int, height: Int, n_frames: Int,
      us_per_frame: Long, duration_ms: Long)

  /** Probe result: real metadata where the bytes decode, the blob's own
    * declared metadata where they don't (`decoded` says which).
    */
  final case class MediaProbe(media_id: Long, kind: String, format: String,
      width: Int, height: Int, channels: Int, sample_rate: Int,
      duration_ms: Long, decoded: Boolean)

  /** The codec boundary. [[decodeImageMeta]]/[[decodeWavMeta]] are REAL
    * (JDK-only, executor-safe); the model-shaped calls below them are
    * deterministic STUBS a production build replaces (e.g. via JNI/javacpp)
    * without touching the pipeline.
    */
  object Codecs {
    val FeatureDim = 8

    // ImageIO's default stream factory spools InputStream reads through a
    // temp FILE (FileCacheImageInputStream): a file create/delete per
    // decode attempt — pure overhead on byte-array payloads, and a
    // temp-dir bottleneck once the decode stage is parallel (round-12
    // profile: the fanned-out media_features accumulated ~60 s of task
    // time for ~3 s of real decode work, the rest serialized on temp-file
    // churn). Round 12 flipped the process-global ImageIO.setUseCache
    // flag here; round 13 (ADVICE r12) removes the global mutation —
    // every decode in this object now constructs its
    // MemoryCacheImageInputStream EXPLICITLY, which is result-identical
    // (the flag only ever selected the stream class), free of
    // classload-ordering dependence, and leaves other ImageIO users'
    // behavior alone.

    /** Decode real image container metadata (PNG/JPEG/GIF/BMP — whatever
      * the JDK's ImageIO plugins recognise) without materializing the
      * raster: the reader is asked for dimensions and the raw image type
      * only, so cost is header-bytes, not pixels. Returns None for bytes no
      * installed reader claims — the null-safe fallback path.
      */
    def decodeImageMeta(content: Array[Byte]): Option[ImageMeta] = {
      import javax.imageio.ImageIO
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val types = r.getImageTypes(0)
            val channels =
              if (types.hasNext) types.next().getNumComponents else -1
            Some(ImageMeta(r.getFormatName.toLowerCase(java.util.Locale.ROOT),
              r.getWidth(0), r.getHeight(0), channels))
          } finally r.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally iis.close()
    }

    /** Parse a RIFF/WAVE header: channels, sample rate, bit depth, and
      * duration derived from the data-chunk size over the byte rate. A
      * chunk walk (not a fixed 44-byte offset) so files with extra chunks
      * (LIST/fact) before `data` still parse; malformed sizes abort to
      * None rather than over-read.
      */
    def decodeWavMeta(content: Array[Byte]): Option[WavMeta] = {
      def ascii(off: Int, n: Int) = new String(content, off, n, "US-ASCII")
      def le16(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
      def le32(o: Int): Long =
        (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
          ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
      if (content.length < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
        return None
      var off = 12
      var fmt: Option[(Int, Long, Long, Int)] = None // (ch, rate, byteRate, bits)
      var dataSize = -1L
      while (off + 8 <= content.length && (fmt.isEmpty || dataSize < 0)) {
        val id = ascii(off, 4)
        val size = le32(off + 4)
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= content.length)
          fmt = Some((le16(off + 10), le32(off + 12), le32(off + 16),
            le16(off + 22)))
        else if (id == "data") dataSize = size
        // chunks are word-aligned; a bogus size would loop or over-read
        if (size < 0 || size > Int.MaxValue - 9) return None
        off += 8 + size.toInt + (size.toInt & 1)
      }
      fmt.collect {
        case (ch, rate, byteRate, bits) if dataSize >= 0 && byteRate > 0 =>
          WavMeta(ch, rate.toInt, bits, dataSize * 1000L / byteRate)
      }
    }

    /** REAL featurize for decodable payloads: an 8-bin normalized
      * histogram over the DECODED content — per-pixel luminance for any
      * raster the JDK's ImageIO fully decodes (PNG/JPEG/GIF/BMP), signed
      * 16-bit PCM amplitude for WAV — so the feature is a deterministic
      * function of the media itself, not of its container bytes (the same
      * image re-encoded at a different compression level featurizes
      * identically under the raster path, never under a byte fold).
      * No ML model: this is the classical color/amplitude-histogram
      * embedding. Returns None when nothing decodes; [[extractFeatures]]
      * then falls back to the [[imageFeature]] byte-fold stub, which
      * remains the seam a production build swaps for a model forward pass.
      */
    def realFeature(content: Array[Byte]): Option[Array[Float]] =
      rasterHistogram(content).orElse(wavHistogram(content))
        .orElse(aviHistogram(content))

    /** Full raster decode → luminance histogram (FeatureDim bins, L1-
      * normalized). Decoding cost is pixels, not header bytes — this is
      * the "decode step" tier above [[decodeImageMeta]]'s header probe.
      */
    def rasterHistogram(content: Array[Byte]): Option[Array[Float]] =
      try {
        rasterRgb(content).flatMap { case (w, h, px) =>
          val counts = new Array[Long](FeatureDim)
          var i = 0
          while (i < w * h) {
            val rgb = px(i)
            // ITU-R BT.601 integer luma
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            counts(lum * FeatureDim / 256) += 1
            i += 1
          }
          normalized(counts)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** WAV data-chunk decode → signed-16-bit-PCM amplitude histogram
      * (FeatureDim bins over [-32768, 32768), L1-normalized). Only
      * bits_per_sample == 16 qualifies — other depths fall through to the
      * stub rather than mis-bin.
      */
    def wavHistogram(content: Array[Byte]): Option[Array[Float]] = {
      def ascii(off: Int, n: Int) = new String(content, off, n, "US-ASCII")
      def le32(o: Int): Long =
        (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
          ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
      decodeWavMeta(content).filter(_.bits_per_sample == 16).flatMap { _ =>
        // re-walk the chunks for the data payload span
        var off = 12
        var span: Option[(Int, Int)] = None
        while (off + 8 <= content.length && span.isEmpty) {
          val size = le32(off + 4)
          if (size < 0 || size > Int.MaxValue - 9) return None
          if (ascii(off, 4) == "data")
            span = Some((off + 8,
              math.min(content.length, off + 8 + size.toInt)))
          off += 8 + size.toInt + (size.toInt & 1)
        }
        span.flatMap { case (from, to) =>
          val counts = new Array[Long](FeatureDim)
          var i = from
          while (i + 1 < to) {
            val s = ((content(i) & 0xff) | (content(i + 1) << 8)).toShort
            counts(((s + 32768) * FeatureDim) >>> 16) += 1
            i += 2
          }
          normalized(counts) // zero-sample data chunk: fall back to the stub
        }
      }
    }

    private def normalized(counts: Array[Long]): Option[Array[Float]] = {
      val n = counts.sum
      if (n == 0L) None
      else Some(counts.map(c => c.toDouble.toFloat / n))
    }

    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** REAL video container parsing for RIFF/AVI (the uncompressed-DIB
      * profile — '00db' streams, the one profile decodable with zero
      * codec dependencies): a recursive LIST walk collects the `avih`
      * main header (frame clock, declared dims), the first video `strf`
      * (a BITMAPINFOHEADER), and every frame chunk. Each extracted frame
      * is RE-WRAPPED as a standalone BMP file (14-byte file header +
      * the stream's own BITMAPINFOHEADER + the DIB payload), so frames
      * come out as self-contained decodable images — [[rasterHistogram]]
      * and any downstream image step run on them unchanged. Compressed
      * fourccs ('00dc' payloads under a non-zero biCompression) still
      * parse structurally but their frames won't raster-decode; they
      * degrade to the byte-fold stub like any other undecodable payload.
      * Malformed sizes abort to None rather than over-read.
      */
    def decodeAviMeta(content: Array[Byte]): Option[AviMeta] =
      parseAvi(content).map(_._1)

    /** The real frames of an AVI payload, each as a standalone BMP. */
    def decodeAviFrames(content: Array[Byte]): Option[Seq[Array[Byte]]] =
      parseAvi(content).map(_._2).filter(_.nonEmpty)

    private def parseAvi(
        content: Array[Byte]): Option[(AviMeta, Seq[Array[Byte]])] =
      try {
        def ascii(off: Int, n: Int) = new String(content, off, n, "US-ASCII")
        if (content.length < 24 || ascii(0, 4) != "RIFF" ||
          ascii(8, 4) != "AVI ") return None
        var avih: Option[(Long, Long, Long)] = None // usPerFrame, w, h
        var strf: Option[Array[Byte]] = None
        val frames = Seq.newBuilder[Array[Byte]]
        var bad = false
        def walk(from: Int, to: Int): Unit = {
          var off = from
          while (!bad && off + 8 <= to) {
            val id = ascii(off, 4)
            val size = le32(content, off + 4)
            if (size < 0 || size > Int.MaxValue - 9 ||
              off + 8 + size > to) { bad = true; return }
            val sz = size.toInt
            if (id == "LIST" && sz >= 4) walk(off + 12, off + 8 + sz)
            else if (id == "avih" && sz >= 40)
              avih = Some((le32(content, off + 8), le32(content, off + 40),
                le32(content, off + 44)))
            else if (id == "strf" && strf.isEmpty && sz >= 40)
              strf = Some(
                java.util.Arrays.copyOfRange(content, off + 8, off + 8 + sz))
            else if ((id == "00db" || id == "00dc") && sz > 0)
              frames +=
                java.util.Arrays.copyOfRange(content, off + 8, off + 8 + sz)
            off += 8 + sz + (sz & 1)
          }
        }
        walk(12,
          math.min(content.length.toLong, 8L + le32(content, 4)).toInt)
        if (bad) None
        else avih.map { case (us, w, h) =>
          val wrapped = strf match {
            case Some(info) => frames.result().map(wrapBmp(info, _))
            case None => frames.result()
          }
          (AviMeta(w.toInt, h.toInt, wrapped.length, us,
            us * wrapped.length / 1000L), wrapped)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** DIB payload + its BITMAPINFOHEADER → a standalone BMP file. */
    private def wrapBmp(info: Array[Byte], dib: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](14 + info.length + dib.length)
      val dataOff = 14 + info.length
      out(0) = 'B'; out(1) = 'M'
      def putLe32(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte
        out(o + 2) = (v >>> 16).toByte; out(o + 3) = (v >>> 24).toByte
      }
      putLe32(2, out.length)
      putLe32(10, dataOff)
      System.arraycopy(info, 0, out, 14, info.length)
      System.arraycopy(dib, 0, out, dataOff, dib.length)
      out
    }

    /** Video featurize: the mean of the per-frame luminance histograms —
      * a deterministic function of the decoded pixels, like the raster
      * and WAV tiers. None when no frame raster-decodes.
      */
    def aviHistogram(content: Array[Byte]): Option[Array[Float]] =
      decodeAviFrames(content).flatMap { frames =>
        val hists = frames.flatMap(rasterHistogram)
        if (hists.isEmpty) None
        else {
          val acc = new Array[Float](FeatureDim)
          hists.foreach(h => (0 until FeatureDim).foreach(i => acc(i) += h(i)))
          Some(acc.map(_ / hists.length))
        }
      }

    /** REAL 64-bit perceptual hash (the classic DCT pHash) of any raster
      * ImageIO fully decodes: area-averaged 32×32 integer-luma grid
      * (BT.601, same luma as [[rasterHistogram]]) → 2-D DCT-II → the 8×8
      * low-frequency block, bit j set iff coefficient j (row-major)
      * exceeds the MEDIAN of the 63 non-DC coefficients. Re-encoding the
      * same raster (PNG ↔ BMP) hashes identically; small pixel edits move
      * few bits; unrelated images land ~32 bits apart — the image
      * near-dup signal content hashing can't give. Deterministic: integer
      * luma, fixed-order double DCT, no RNG.
      */
    /** Row-major 0xRRGGBB raster of an UNCOMPRESSED 24/32-bit BI_RGB BMP,
      * decoded natively — the hot path for the DIB frames this library
      * wraps out of AVIs ([[wrapBmp]]) and for plain BMP uploads. A
      * per-frame `ImageIO.read` costs plugin lookup, stream wrapping and
      * a BufferedImage per call (the measured dominant cost of the video
      * fingerprint pass); this is one bounds-checked array walk. Returns
      * the exact pixel values ImageIO's BMP reader produces (asserted by
      * the container-invariance spec), handling both bottom-up and
      * top-down rows; anything else (palette, RLE, other containers)
      * falls back to ImageIO in [[rasterRgb]].
      */
    private def decodeBmpRgb(content: Array[Byte]): Option[(Int, Int, Array[Int])] =
      try {
        if (content.length < 54 || content(0) != 'B'.toByte ||
          content(1) != 'M'.toByte) return None
        val dataOff = le32(content, 10).toInt
        if (le32(content, 14).toInt < 40) return None // BITMAPINFOHEADER+
        val w = le32(content, 18).toInt
        val hRaw = le32(content, 22).toInt
        val bpp = (content(28) & 0xff) | ((content(29) & 0xff) << 8)
        val comp = le32(content, 30).toInt
        if (w <= 0 || hRaw == 0 || comp != 0 || (bpp != 24 && bpp != 32))
          return None
        val h = math.abs(hRaw)
        val bytesPp = bpp / 8
        val stride = ((w * bytesPp + 3) / 4) * 4
        if (dataOff < 54 || dataOff.toLong + stride.toLong * h > content.length)
          return None
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          val srcRow = if (hRaw > 0) h - 1 - y else y // bottom-up default
          var o = dataOff + srcRow * stride
          var x = 0
          while (x < w) {
            out(y * w + x) = ((content(o + 2) & 0xff) << 16) |
              ((content(o + 1) & 0xff) << 8) | (content(o) & 0xff)
            o += bytesPp; x += 1
          }
          y += 1
        }
        Some((w, h, out))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Decoded (w, h, row-major 0xRRGGBB) raster of any supported image:
      * native BMP fast path, then ImageIO (PNG/JPEG/GIF/…) with ONE bulk
      * getRGB (per-pixel getRGB pays a color-model conversion per call).
      */
    private def rasterRgb(content: Array[Byte]): Option[(Int, Int, Array[Int])] =
      decodeBmpRgb(content).orElse(try {
        // explicit in-memory stream (see the Codecs note): ImageIO.read on
        // a bare InputStream would route through createImageInputStream,
        // whose default factory spools byte-array reads via a temp file.
        // read(ImageInputStream) closes the stream itself.
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(content)))
        if (img == null || img.getWidth == 0 || img.getHeight == 0) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)
            .map(_ & 0xffffff)))
        }
      } catch { case scala.util.control.NonFatal(_) => None })

    def pHash64(content: Array[Byte]): Option[Long] =
      try {
        rasterRgb(content) match {
          case None => None
          case Some((w, h, px)) =>
          val N = 32
          val g = Array.ofDim[Double](N, N)
          var ty = 0
          while (ty < N) {
            val y0 = ty * h / N; val y1 = math.max(y0 + 1, (ty + 1) * h / N)
            var tx = 0
            while (tx < N) {
              val x0 = tx * w / N; val x1 = math.max(x0 + 1, (tx + 1) * w / N)
              var sum = 0L; var cnt = 0
              var y = y0
              while (y < y1 && y < h) {
                var x = x0
                while (x < x1 && x < w) {
                  val rgb = px(y * w + x)
                  sum += (((rgb >> 16) & 0xff) * 299 +
                    ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                  cnt += 1; x += 1
                }
                y += 1
              }
              g(ty)(tx) = if (cnt == 0) 0.0 else sum.toDouble / cnt
              tx += 1
            }
            ty += 1
          }
          // separable DCT-II: rows first (N×N → N×K), then columns
          // (N×K → K×K) — N·N·K + N·K·K multiplies instead of the naive
          // K²·N² quadruple loop (6× at N=32, K=8)
          val K = 8
          val cosT = Array.tabulate(K, N)((u, x) =>
            math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))
          val rows = Array.ofDim[Double](N, K)
          var y = 0
          while (y < N) {
            var v = 0
            while (v < K) {
              var acc = 0.0
              var x = 0
              while (x < N) { acc += g(y)(x) * cosT(v)(x); x += 1 }
              rows(y)(v) = acc
              v += 1
            }
            y += 1
          }
          val block = new Array[Double](K * K)
          var u = 0
          while (u < K) {
            var v = 0
            while (v < K) {
              var acc = 0.0
              var yy = 0
              while (yy < N) { acc += rows(yy)(v) * cosT(u)(yy); yy += 1 }
              block(u * K + v) = acc
              v += 1
            }
            u += 1
          }
          val nonDc = java.util.Arrays.copyOfRange(block, 1, K * K)
          java.util.Arrays.sort(nonDc)
          val med = nonDc(nonDc.length / 2)
          var fp = 0L
          var j = 0
          while (j < 64) {
            if (block(j) > med) fp |= (1L << j)
            j += 1
          }
          Some(fp)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** First ≤ `max` signed-16-bit PCM samples of a WAV payload (mono
      * interpretation: frames are read as raw sample stream). None unless
      * the container decodes as 16-bit WAV.
      */
    def pcm16(content: Array[Byte], max: Int = 1 << 20): Option[Array[Short]] = {
      def ascii(off: Int, n: Int) = new String(content, off, n, "US-ASCII")
      decodeWavMeta(content).filter(_.bits_per_sample == 16).flatMap { _ =>
        var off = 12
        var span: Option[(Int, Int)] = None
        while (off + 8 <= content.length && span.isEmpty) {
          val size = le32(content, off + 4)
          if (size < 0 || size > Int.MaxValue - 9) return None
          if (ascii(off, 4) == "data")
            span = Some((off + 8,
              math.min(content.length, off + 8 + size.toInt)))
          off += 8 + size.toInt + (size.toInt & 1)
        }
        span.flatMap { case (from, to) =>
          val n = math.min((to - from) / 2, max)
          if (n <= 0) None
          else Some(Array.tabulate(n)(i =>
            ((content(from + 2 * i) & 0xff) |
              (content(from + 2 * i + 1) << 8)).toShort))
        }
      }
    }

    /** 64-bit audio fingerprint (the Haitsma–Kalker "robust hash" shape)
      * for 16-bit PCM WAV: the stream is cut into 9 equal frames; per
      * frame, Goertzel energy at 9 fixed normalized frequencies
      * ω_k = π(k+1)/16; bit (f,b) = sign of the time-delta of the
      * band-delta, ΔΔE = (E(f+1,b)−E(f+1,b+1)) − (E(f,b)−E(f,b+1)) —
      * 8 frames × 8 band-deltas = 64 bits. Signs of linear functionals
      * of energy: invariant to overall amplitude scaling, tolerant to
      * small additive noise, and discriminative across tone structures.
      * Frames longer than 4096 samples are strided down — cost is
      * bounded per blob whatever the duration.
      */
    def audioFp64(content: Array[Byte]): Option[Long] = audioFp64(content, 0)

    /** `phase` shifts every frame boundary by `phase/(phase+1)` of a
      * frame (0, 1/2, 2/3, 3/4, … — every phase a DISTINCT alignment, so
      * OR-amplification keeps buying independence at any phase count) —
      * the extra "views" OR-amplified dedup pairs on. Quantization-induced
      * sign flips of near-zero energy deltas are boundary-dependent, so
      * the phases' flips are largely independent (measured: 2.8% of
      * planted re-masters beyond Hamming 7 at phase 0 alone, ~0.2% when
      * either of the first two phases may match). phase 0 = the historical
      * fingerprint, bit-identical; phase 1 = the historical half-frame
      * shift, bit-identical.
      */
    def audioFp64(content: Array[Byte], phase: Int): Option[Long] =
      pcm16(content).flatMap { s =>
        require(phase >= 0, s"phase must be >= 0, got $phase")
        val frames = 9; val bands = 9
        // the shifted view re-derives its frame length from the remaining
        // samples, so all 9 frames stay disjoint (a tail clamp would make
        // the last two frames overlap and turn their delta bits into
        // quantization noise); phase 0 reduces to the historical framing,
        // bit-identical
        val shift = (s.length / frames) * phase / (phase + 1)
        if (s.length - shift < frames * 2) None
        else {
          val e = Array.ofDim[Double](frames, bands)
          val flen = (s.length - shift) / frames
          val stride = math.max(1, flen / 4096)
          var f = 0
          while (f < frames) {
            val from = shift + f * flen
            var b = 0
            while (b < bands) {
              // Goertzel recurrence on the strided subsequence (effective
              // frequency ω·stride): one multiply-add per sample, no trig
              // in the loop — the direct cos/sin correlation this replaced
              // dominated the whole media bench
              val w = math.Pi * (b + 1) / 16.0 * stride
              val coeff = 2.0 * math.cos(w)
              var s1 = 0.0; var s2 = 0.0
              var i = from
              while (i < from + flen) {
                val s0 = s(i) + coeff * s1 - s2
                s2 = s1; s1 = s0
                i += stride
              }
              // |X|² = s1² + s2² − coeff·s1·s2
              e(f)(b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
              b += 1
            }
            f += 1
          }
          var fp = 0L
          var j = 0
          while (j < 64) {
            val fr = j / 8; val b = j % 8
            val dd = (e(fr + 1)(b) - e(fr + 1)(b + 1)) -
              (e(fr)(b) - e(fr)(b + 1))
            if (dd > 0.0) fp |= (1L << j)
            j += 1
          }
          Some(fp)
        }
      }

    /** Minimal 16-bit mono PCM WAV encoder — the audio twin of
      * [[encodeBmp24]] for synthesizing real decodable payloads.
      */
    def encodeWav16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      def put(o: Int, s: String): Unit =
        s.getBytes("US-ASCII").copyToArray(out, o)
      def le16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def le32v(o: Int, v: Int): Unit = {
        le16(o, v & 0xffff); le16(o + 2, (v >>> 16) & 0xffff)
      }
      put(0, "RIFF"); le32v(4, 36 + dataSize); put(8, "WAVE")
      put(12, "fmt "); le32v(16, 16); le16(20, 1); le16(22, 1)
      le32v(24, sampleRate); le32v(28, sampleRate * 2); le16(32, 2)
      le16(34, 16)
      put(36, "data"); le32v(40, dataSize)
      var i = 0
      while (i < samples.length) {
        le16(44 + 2 * i, samples(i) & 0xffff); i += 1
      }
      out
    }

    /** Minimal RIFF/AVI encoder for the uncompressed-DIB profile
      * [[decodeAviFrames]] parses — real, self-contained video payloads
      * for specs and the synthetic corpora. `frames` are row-major
      * 0xRRGGBB rasters of size w×h.
      */
    def encodeAvi(w: Int, h: Int, usPerFrame: Int,
        frames: Seq[Array[Int]]): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val rowSize = ((w * 3 + 3) / 4) * 4
      def dib(px: Array[Int]): Array[Byte] = {
        val out = new Array[Byte](rowSize * h)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = px(y * w + x)
          val o = (h - 1 - y) * rowSize + x * 3
          out(o) = (rgb & 0xff).toByte
          out(o + 1) = ((rgb >> 8) & 0xff).toByte
          out(o + 2) = ((rgb >> 16) & 0xff).toByte
        }
        out
      }
      def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
      val strf = le(40).putInt(40).putInt(w).putInt(h).putShort(1)
        .putShort(24).putInt(0).putInt(rowSize * h)
        .putInt(0).putInt(0).putInt(0).putInt(0).array()
      val avih = le(56).putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0).array()
      val strh = new Array[Byte](56)
      System.arraycopy("vids".getBytes("US-ASCII"), 0, strh, 0, 4)
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length & 1
        le(8 + body.length + pad).put(id.getBytes("US-ASCII"))
          .putInt(body.length).put(body).array()
      }
      def list(typ: String, children: Array[Byte]): Array[Byte] =
        chunk("LIST", typ.getBytes("US-ASCII") ++ children)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi =
        list("movi", frames.map(f => chunk("00db", dib(f))).reduce(_ ++ _))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      le(8 + body.length).put("RIFF".getBytes("US-ASCII"))
        .putInt(body.length).put(body).array()
    }

    /** Temporally-coherent synthetic frames: every frame shares the
      * seed's tile raster, with an 8×8 brightened block sweeping the
      * diagonal (the "motion"). Real videos have correlated frames —
      * that coherence is what makes a majority-vote fingerprint robust
      * to frame drops; mutually-unrelated frames would make the vote a
      * coin toss the moment one frame disappears.
      */
    def motionFrames(seed: Long, tweak: Boolean,
        nFrames: Int): Seq[Array[Int]] =
      (0 until nFrames).map { f =>
        val px = tilePx(seed, tweak)
        var y = f * 8
        while (y < f * 8 + 8 && y < 32) {
          var x = f * 8
          while (x < f * 8 + 8 && x < 32) {
            val g = math.min(255, (px(y)(x) & 0xff) + 40)
            px(y)(x) = (g << 16) | (g << 8) | g
            x += 1
          }
          y += 1
        }
        px.flatten
      }

    /** 64-bit video fingerprint: per-frame DCT pHash ([[pHash64]] over
      * the real extracted frames), reduced by per-bit MAJORITY VOTE —
      * robust to dropped/reordered frames and per-frame edits the same
      * way SimHash is robust to word edits. None unless ≥ 1 frame
      * raster-decodes.
      */
    def videoFp64(content: Array[Byte]): Option[Long] =
      decodeAviFrames(content).flatMap { frames =>
        val hs = frames.flatMap(pHash64(_))
        if (hs.isEmpty) None
        else {
          var fp = 0L
          var b = 0
          while (b < 64) {
            val votes = hs.count(h => ((h >> b) & 1L) != 0L)
            if (2 * votes > hs.size) fp |= (1L << b)
            b += 1
          }
          Some(fp)
        }
      }

    /** Minimal 24-bit BI_RGB BMP encoder (bottom-up rows, 4-byte padded) —
      * a byte-deterministic container for synthesizing REAL decodable
      * rasters (no ImageIO.write, whose encoder choice could vary).
      * `px(y)(x)` = 0xRRGGBB.
      */
    def encodeBmp24(px: Array[Array[Int]]): Array[Byte] = {
      val h = px.length; val w = if (h == 0) 0 else px(0).length
      val rowBytes = (w * 3 + 3) & ~3
      val dataSize = rowBytes * h
      val out = new Array[Byte](54 + dataSize)
      def le16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def le32(o: Int, v: Int): Unit = {
        le16(o, v & 0xffff); le16(o + 2, (v >>> 16) & 0xffff)
      }
      out(0) = 'B'; out(1) = 'M'
      le32(2, 54 + dataSize); le32(10, 54); le32(14, 40)
      le32(18, w); le32(22, h); le16(26, 1); le16(28, 24)
      le32(34, dataSize)
      var y = 0
      while (y < h) {
        val rowOff = 54 + (h - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < w) {
          val p = px(y)(x)
          out(rowOff + x * 3) = (p & 0xff).toByte         // B
          out(rowOff + x * 3 + 1) = ((p >> 8) & 0xff).toByte
          out(rowOff + x * 3 + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    /** Deterministic 32×32 gray raster from a seed: a coarse 4×4 grid of
      * 8-px tiles (¾ weight) blended with a fine 8×8 grid of 4-px tiles
      * (¼ weight). The two scales matter: aligned single-scale tiles
      * leave ~⅔ of the 8×8 DCT block EXACTLY zero (piecewise-constant
      * cancellation), parking half the pHash bits on the median where any
      * edit flips them; the fine grid puts real energy in every low
      * frequency, so near-copies drift ≤ ~4 bits while distinct seeds
      * land ~32 apart. `tweak` brightens 5 diagonal pixels by a clamped
      * +24 — the planted "small edit" of a near-copy.
      */
    def tilePx(seed: Long, tweak: Boolean): Array[Array[Int]] = {
      // SplitMix64 finalizer per tile — a LINEAR tile function (e.g.
      // Knuth-multiply of seed+t) makes every seed's pattern a translate
      // of the same shape, and pHash (which ignores the DC offset)
      // collapses the whole corpus onto ~200 hashes; full avalanche
      // keeps distinct seeds ~32 bits apart
      def mix(z0: Long): Long = {
        var z = z0
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      def tiles(n: Int, salt: Long): Array[Int] =
        Array.tabulate(n)(t =>
          (mix(seed + salt * 1000L + t * 0x9E3779B97F4A7C15L) & 0xff).toInt)
      val t8 = tiles(16, 0L)
      val t4 = tiles(64, 1L)
      Array.tabulate(32, 32) { (y, x) =>
        var gray = (3 * t8((y / 8) * 4 + (x / 8)) +
          t4((y / 4) * 8 + (x / 4))) / 4
        if (tweak && y == x && x < 5) gray = math.min(gray + 24, 255)
        (gray << 16) | (gray << 8) | gray
      }
    }

    /** STUB decode+featurize: derives a fixed-dim float vector from content
      * bytes (stands in for decode → model forward pass).
      */
    def imageFeature(content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        out(i % FeatureDim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** REAL raster resize for any payload [[rasterRgb]] decodes (BMP fast
      * path, ImageIO for PNG/JPEG/GIF): per-channel area-average
      * resampling to (w, h) — the box filter every training-data resize
      * pass uses for downscale — re-encoded as 24-bit BMP. Deterministic
      * integer arithmetic, no RNG, no color-model surprises.
      */
    def resizeRaster(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      if (w <= 0 || h <= 0) None
      else rasterRgb(content).map { case (sw, sh, px) =>
        val out = Array.ofDim[Int](h, w)
        var ty = 0
        while (ty < h) {
          val y0 = ty * sh / h; val y1 = math.max(y0 + 1, (ty + 1) * sh / h)
          var tx = 0
          while (tx < w) {
            val x0 = tx * sw / w; val x1 = math.max(x0 + 1, (tx + 1) * sw / w)
            var r = 0L; var g = 0L; var b = 0L; var n = 0
            var y = y0
            while (y < y1 && y < sh) {
              var x = x0
              while (x < x1 && x < sw) {
                val p = px(y * sw + x)
                r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                n += 1; x += 1
              }
              y += 1
            }
            if (n == 0) n = 1
            out(ty)(tx) = ((r / n).toInt << 16) | ((g / n).toInt << 8) |
              (b / n).toInt
            tx += 1
          }
          ty += 1
        }
        encodeBmp24(out)
      }

    /** Resize with the stub fallback: payloads without a raster reading
      * (audio, video containers, junk) keep the deterministic truncation
      * stand-in — the documented seam a production build swaps for a
      * full codec suite.
      */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      resizeRaster(content, w, h).getOrElse(
        java.util.Arrays.copyOf(content, math.min(content.length,
          math.max(16, w * h / 64))))

    /** Content-change KEYFRAME selection over an AVI's real frames: keep
      * frame 0 and every frame whose DCT pHash moves more than `minDist`
      * bits from the last KEPT frame — the cheap core of shot-boundary
      * detection (small inter-frame motion stays under the threshold,
      * scene cuts jump ~half the bits). Frames that don't raster-decode
      * are skipped. None when the payload has no decodable frames.
      */
    def keyFrames(content: Array[Byte],
        minDist: Int): Option[Seq[(Int, Array[Byte])]] =
      decodeAviFrames(content).map { frames =>
        var lastFp = Option.empty[Long]
        frames.zipWithIndex.flatMap { case (f, i) =>
          pHash64(f) match {
            case Some(fp) if lastFp.forall(l =>
                java.lang.Long.bitCount(l ^ fp) > minDist) =>
              lastFp = Some(fp); Some((i, f))
            case _ => None
          }
        }
      }

    /** Frame sampling. REAL for AVI payloads: up to `n` evenly spaced
      * actual frames (each a standalone BMP via [[decodeAviFrames]]) —
      * the keyframe-extraction step of a video curation pipeline. Bytes
      * that don't parse as AVI fall back to the deterministic byte-slice
      * stub (the seam a production build swaps for a full codec).
      */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] =
      decodeAviFrames(content) match {
        case Some(frames) =>
          (0 until math.max(1, n))
            .map(i => i.toLong * frames.length / math.max(1, n))
            .distinct.map(i => frames(i.toInt))
        case None => sampleFramesStub(content, n)
      }

    /** STUB frame sampling: slices the payload into `n` chunks
      * (stands in for keyframe extraction of non-AVI codecs).
      */
    def sampleFramesStub(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val step = math.max(1, content.length / math.max(1, n))
      (0 until n).map { i =>
        val from = math.min(i * step, content.length)
        val to = math.min(from + step, content.length)
        java.util.Arrays.copyOfRange(content, from, to)
      }
    }
  }

  /** Wrap any table into media blobs (harness adapter: treats a string
    * column's bytes as the payload — real ingestion reads binaryFile or
    * parquet binary columns).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      kind: String = "image"): Dataset[MediaBlob] = {
    val spark = df.sparkSession
    import spark.implicits._
    // null payloads/ids carry no media — drop them rather than NPE in the
    // executor map (the Long/String tuple encoder is non-nullable).
    // NOT fanned out (round-12 A/B): with the Codecs ImageIO in-memory
    // streams the whole text→blob→feature chain is ~0.8 s of serial CPU
    // at sf0.1, below the measured ~0.2 s/task dispatch floor × 32 —
    // the exchange lost (1.45 s vs 1.30 s). Real blob corpora arrive
    // multi-split (memoSynth spreads its writes for exactly that).
    df.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        MediaBlob(id, kind, bytes, s"$kind/fake", 64, 64, -1L)
      }
  }

  /** Probe real container metadata for every blob: image formats first
    * (magic-byte dispatch is the readers' own `canDecode`), then WAV; bytes
    * nothing recognises fall back to the blob's declared metadata with
    * `decoded = false` — a corrupt or exotic payload degrades to the stub
    * path instead of failing the partition. Narrow mapPartitions, payload
    * never shuffled; output rows are small and join-friendly.
    */
  def probeAll(media: Dataset[MediaBlob]): Dataset[MediaProbe] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      Codecs.decodeImageMeta(m.content) match {
        case Some(im) =>
          MediaProbe(m.media_id, m.kind, im.format, im.width, im.height,
            im.channels, -1, -1L, decoded = true)
        case None => Codecs.decodeWavMeta(m.content) match {
          case Some(w) =>
            MediaProbe(m.media_id, m.kind, "wav", -1, -1, w.channels,
              w.sample_rate, w.duration_ms, decoded = true)
          case None => Codecs.decodeAviMeta(m.content) match {
            case Some(a) =>
              MediaProbe(m.media_id, m.kind, "avi", a.width, a.height,
                -1, -1, a.duration_ms, decoded = true)
            case None =>
              MediaProbe(m.media_id, m.kind, "unknown", m.width, m.height,
                -1, -1, m.duration_ms, decoded = false)
          }
        }
      }
    })
  }

  /** Feature extraction: one batched pass per partition; output rows are
    * small (blob stays behind). Decodable payloads get the REAL
    * decoded-content histogram ([[Codecs.realFeature]]); everything else
    * falls back to the byte-fold stub — same shape, so downstream plumbing
    * never branches.
    */
  def extractFeatures(media: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        md.reset()
        val sha = md.digest(m.content).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong, sha,
          Codecs.realFeature(m.content)
            .getOrElse(Codecs.imageFeature(m.content)))
      }
    }
  }

  /** Resize pipeline: narrow, payload-in/payload-out. */
  def resizeAll(media: Dataset[MediaBlob], w: Int, h: Int): Dataset[MediaBlob] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(m =>
      m.copy(content = Codecs.resize(m.content, w, h), width = w, height = h)))
  }

  /** Frame sampling: one media row → n frame rows (generator shape). */
  def sampleFrames(media: Dataset[MediaBlob], n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap(m => Codecs.sampleFrames(m.content, n).zipWithIndex
      .map { case (c, i) => Frame(m.media_id, i, c) })
  }

  /** Content-change keyframe extraction: one media row → its shot-
    * boundary frames ([[Codecs.keyFrames]] — kept frame indices are the
    * REAL AVI frame numbers). Narrow generator shape like
    * [[sampleFrames]]; payloads without decodable frames emit nothing.
    */
  def keyFrames(media: Dataset[MediaBlob], minDist: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap(m => Codecs.keyFrames(m.content, minDist)
      .getOrElse(Seq.empty)
      .map { case (i, c) => Frame(m.media_id, i, c) })
  }

  /** Feature rows as a DataFrame — small, shuffle/join-friendly (payloads
    * stay behind in the blob Dataset).
    */
  def featureTable(media: Dataset[MediaBlob]): DataFrame =
    extractFeatures(media).toDF()

  /** (media_id, phash) for every blob with a perceptual identity: DCT
    * pHash for decodable rasters ([[Codecs.pHash64]]), the spectral
    * fingerprint for 16-bit WAV ([[Codecs.audioFp64]]). Narrow; payloads
    * never shuffle; blobs decoding as neither drop out (bytes without a
    * perceptual reading are the content-hash tier's job). Image and audio
    * hashes share the 64-bit space — unrelated modalities land ~32 bits
    * apart like any unrelated pair, so a mixed corpus needs no branching.
    */
  def perceptualHash(media: Dataset[MediaBlob]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // dispatch on container magic bytes, not a try-each-decoder chain:
    // a WAV/AVI payload previously paid a FAILED ImageIO plugin scan
    // (and AVI a failed WAV parse) before reaching its own decoder —
    // the dominant cost of the non-image fingerprint passes. Unknown
    // containers keep the permissive fallback chain.
    def riff(c: Array[Byte], tag: String): Boolean =
      c.length >= 12 && c(0) == 'R' && c(1) == 'I' && c(2) == 'F' &&
        c(3) == 'F' && c(8) == tag(0) && c(9) == tag(1) &&
        c(10) == tag(2) && c(11) == tag(3)
    def fp(c: Array[Byte]): Option[Long] =
      if (riff(c, "WAVE")) Codecs.audioFp64(c)
      else if (riff(c, "AVI ")) Codecs.videoFp64(c)
      else Codecs.pHash64(c).orElse(Codecs.audioFp64(c))
        .orElse(Codecs.videoFp64(c))
    media.mapPartitions(_.flatMap(m =>
      fp(m.content).map(p => (m.media_id, p)))).toDF(
      "media_id", "phash")
  }

  /** Byte-identity dedup of a media corpus (keeper = min media_id per
    * content sha) — the content-hash rung BELOW [[nearDupMedia]] in the
    * media dedup ladder; running it first keeps exact-copy floods (the
    * same meme uploaded 10⁶ times) out of the banded pair join, exactly
    * as the text ladder runs `Dedup.exact` before the shingle tiers.
    * Only (media_id, sha) rows cross the sha exchange; the payload side
    * is filtered by a semi-join on the (far smaller) keeper-id list.
    */
  def dedupExactMedia(media: Dataset[MediaBlob]): Dataset[MediaBlob] = {
    val spark = media.sparkSession
    import spark.implicits._
    val df = media.toDF()
    val keepIds = df
      .select(col("media_id"), sha2(col("content"), 256).as("__sha"))
      .groupBy("__sha").agg(min("media_id").as("media_id"))
      .select("media_id")
    df.join(keepIds, Seq("media_id"), "left_semi").as[MediaBlob]
  }

  /** Image near-dup candidate pairs within Hamming distance `maxDist` of
    * their perceptual hashes, blocked on 4×16-bit bands (pigeonhole: a
    * pair within distance 3 agrees on ≥ 1 band) — the image twin of
    * [[Dedup.simHashPairs]], and the media rung of the dedup ladder:
    * byte-identical copies fall to content hashing, re-encodes and
    * small edits fall HERE, semantic similarity falls to embeddings.
    * Only (media_id, phash) rows reach the join.
    *
    * `maxBucket` is the tier-standard skew guard (broadcast anti-join
    * drop of over-cap band buckets): a meme template shared by 10⁶
    * images would otherwise go quadratic in one bucket. Exact-copy
    * floods belong to the content-hash tier anyway — run sha dedup
    * first, like the text ladder.
    */
  def nearDupMedia(media: Dataset[MediaBlob], maxDist: Int = 3,
      maxBucket: Long = 1000L, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    // pigeonhole: a pair within distance bands−1 is GUARANTEED to agree
    // on ≥ 1 band; beyond that the blocking is best-effort (flips spread
    // across every band escape). Pick bands > the maxDist you must not
    // miss — 8×8-bit for the audio tier's looser distances.
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val fp = perceptualHash(media)
    val banded0 = fp.select(col("media_id"), col("phash"),
      posexplode(array((0 until bands).map(i =>
        shiftright(col("phash"), i * bandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "band_val")))
    val banded =
      if (maxBucket <= 0) banded0
      else Dedup.dropHotKeys(banded0, Seq("band", "band_val"), maxBucket)
        .localCheckpoint(false)
    val a = banded.select(col("band"), col("band_val"),
      col("media_id").as("id_a"), col("phash").as("fp_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("media_id").as("id_b"), col("phash").as("fp_b"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long")
          .as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** OR-amplified audio near-dup: each blob is fingerprinted at
    * `phases` DISTINCT frame alignments ([[Codecs.audioFp64]] shifts
    * phase p by p/(p+1) of a frame) and a pair qualifies when ANY
    * phase's fingerprints sit
    * within `maxDist` — the media twin of the embedding tier's
    * OR-amplified LSH tables. Quantization flips of near-zero energy
    * deltas are frame-boundary-dependent, so the phases miss (mostly)
    * independently: the 2.8% single-phase tail beyond Hamming 7
    * collapses to ~0.2%. Phase count is the recall/compute dial — the
    * banded join runs once per phase, everything stays banded and
    * hot-key capped, and `hamming` reports the minimum across phases.
    */
  def nearDupAudioAmplified(media: Dataset[MediaBlob], maxDist: Int = 7,
      maxBucket: Long = 1000L, bands: Int = 8, phases: Int = 2,
      /** Distance bound for the amplified phases (≥ 1): stricter than
        * the primary because each extra view multiplies the tier's
        * false-pair rate — measured on the synthetic corpus, phase 1 at
        * 5 buys recall 0.972 → 0.994 for +27 base↔base pairs, where 7
        * would add +127 for the same recall.
        */
      ampDist: Int = 5): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(phases >= 1, s"phases must be >= 1, got $phases")
    require(ampDist <= maxDist, s"ampDist $ampDist must be <= maxDist $maxDist")
    val spark = media.sparkSession
    import spark.implicits._
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val fps = media.mapPartitions(_.flatMap { m =>
      (0 until phases).flatMap(p =>
        Codecs.audioFp64(m.content, p).map(f => (m.media_id, p, f)))
    }).toDF("media_id", "phase", "phash")
    val banded0 = fps.select(col("media_id"), col("phase"), col("phash"),
      posexplode(array((0 until bands).map(i =>
        shiftright(col("phash"), i * bandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "band_val")))
    val banded =
      if (maxBucket <= 0) banded0
      else Dedup.dropHotKeys(banded0, Seq("phase", "band", "band_val"),
        maxBucket).localCheckpoint(false)
    val a = banded.select(col("phase"), col("band"), col("band_val"),
      col("media_id").as("id_a"), col("phash").as("fp_a"))
    val b = banded.select(col("phase"), col("band"), col("band_val"),
      col("media_id").as("id_b"), col("phash").as("fp_b"))
    a.join(b, Seq("phase", "band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("phase"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long")
          .as("hamming"))
      .where(col("hamming") <=
        when(col("phase") === 0, lit(maxDist)).otherwise(lit(ampDist)))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** Persist a media corpus's banded fingerprint index, partitioned by
    * band — the media twin of [[Dedup.writeBandIndex]]: the corpus is
    * fingerprinted ONCE; each ingest batch probes the index instead of
    * re-pairing the whole corpus. Rows are (media_id, phash, band,
    * band_val); payloads are never written.
    */
  /** One index row per (blob, band): media_id, phash, band, band_val —
    * the shared projection behind the batch writer, the stream writer
    * and the probe side of [[candidatesAgainstFpIndex]].
    */
  private def fpBandRows(media: Dataset[MediaBlob], bands: Int): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    perceptualHash(media)
      .select(col("media_id"), col("phash"),
        posexplode(array((0 until bands).map(i =>
          shiftright(col("phash"), i * bandBits).bitwiseAND(mask)): _*))
          .as(Seq("band", "band_val")))
  }

  def writeFpIndex(media: Dataset[MediaBlob], path: String,
      bands: Int = 4): Unit =
    fpBandRows(media, bands)
      .write.mode("append").partitionBy("band").parquet(s"$path/batch")

  /** Streaming maintenance of the media fingerprint index (the media
    * twin of [[Similarity.embBandIndexStreamWriter]]): arriving blobs
    * land band-partitioned with the exact batch-writer layout and
    * fingerprints; `$path/stream` keeps the sink's `_spark_metadata`
    * out of the batch segment.
    */
  def fpIndexStreamWriter(media: Dataset[MediaBlob], path: String,
      checkpoint: String, bands: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    fpBandRows(media, bands)
      .writeStream.format("parquet")
      .option("path", s"$path/stream")
      .option("checkpointLocation", checkpoint)
      .partitionBy("band")
      .outputMode("append")
      .start()

  /** Incremental media near-dup: a NEW batch of blobs against the
    * persisted fingerprint index — cost ∝ batch × matching buckets,
    * never corpus². Same distance/banding contract as [[nearDupMedia]]
    * (use the `bands` the index was written with).
    */
  def candidatesAgainstFpIndex(newMedia: Dataset[MediaBlob],
      indexPath: String, maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val spark = newMedia.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segments = Seq(s"$indexPath/batch", s"$indexPath/stream")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    require(segments.nonEmpty, s"no fp-index segments under $indexPath")
    val idx = segments
      .map(p => spark.read.parquet(p)
        .select(col("media_id").as("idx_id"), col("phash").as("idx_fp"),
          col("band"), col("band_val")))
      .reduce(_ unionByName _)
    fpBandRows(newMedia, bands)
      .select(col("media_id").as("new_id"), col("phash").as("new_fp"),
        col("band"), col("band_val"))
      .join(idx, Seq("band", "band_val"))
      .where(col("new_id") =!= col("idx_id"))
      .select(
        least(col("new_id"), col("idx_id")).as("id_a"),
        greatest(col("new_id"), col("idx_id")).as("id_b"),
        bit_count(col("new_fp").bitwiseXOR(col("idx_fp"))).cast("long")
          .as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** JVM-local memo of the synthesized media corpora: the first request
    * for a (modality, source-plan, plantEvery) combination materializes
    * the blobs to a temp PARQUET directory; every later request — the
    * dedup query after the fingerprint query, every bench rep — is a
    * plain parquet read. The synthetic blobs stand in for what is INPUT
    * data in any real deployment (binary columns on disk); without the
    * memo every query over a modality re-runs the pixel/sample/frame
    * generation loops and the bench measures corpus synthesis instead of
    * the decode→fingerprint→band-join operators it exists to measure.
    * A parquet table (not `persist`) so harness-level
    * `spark.catalog.clearCache()` between queries cannot silently turn
    * the input back into a generation pass. The directory name carries a
    * per-JVM token: corpora never leak across processes (the source
    * parquet may be regenerated between runs with the same path).
    */
  private val synthCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int), String]()
  private lazy val synthJvmTag =
    java.util.UUID.randomUUID().toString.take(8)

  private def memoSynth(kind: String, df: DataFrame, plantEvery: Int)(
      build: => Dataset[MediaBlob]): Dataset[MediaBlob] = {
    val spark = df.sparkSession
    import spark.implicits._
    val key = (kind, System.identityHashCode(spark),
      df.queryExecution.analyzed.semanticHash(), plantEvery)
    val path = synthCache.computeIfAbsent(key, _ => {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-synth-" +
        s"$synthJvmTag-$kind-${Integer.toHexString(key._3)}-$plantEvery"
      // spread across files: blob rows are few but each is expensive to
      // fingerprint, and one ~50 MB parquet file would hand the whole
      // decode pass to a single input partition
      val parts = math.max(1, math.min(32,
        spark.sparkContext.defaultParallelism))
      build.repartition(parts).write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path).as[MediaBlob]
  }

  /** Deterministic REAL-raster corpus from a text table: one 32×32 24-bit
    * BMP per doc whose pixels are a smooth two-gradient pattern seeded by
    * the text (distinct texts → distinct low-frequency structure → far
    * pHashes), plus — for every `plantEvery`-th doc — a near-copy (id
    * offset 1,000,000) with a handful of pixels edited: the planted
    * near-dup truth for [[nearDupMedia]], mirroring
    * `PipelineQueries.plantedNearDups` on the embedding side. The blobs
    * are real decodable images, so the whole decode → pHash → band-join
    * path is exercised for real, not via stubs.
    */
  def synthRasterBlobs(df: DataFrame, idCol: String, textCol: String,
      plantEvery: Int = 4): Dataset[MediaBlob] = memoSynth("image", df, plantEvery) {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val seed = text.hashCode.toLong & 0xffffffffL
        val base = MediaBlob(id, "image",
          Codecs.encodeBmp24(Codecs.tilePx(seed, tweak = false)),
          "image/bmp", 32, 32, -1L)
        if (id % plantEvery == 0)
          Seq(base, base.copy(media_id = id + 1000000L,
            content = Codecs.encodeBmp24(Codecs.tilePx(seed, tweak = true))))
        else Seq(base)
      }
  }

  /** Deterministic REAL-AVI corpus from a text table — the video twin of
    * [[synthRasterBlobs]]: four 32×32 tile-raster frames per doc whose
    * tile pattern evolves per frame (seed+frame), encoded as genuine
    * uncompressed-DIB AVI ([[Codecs.encodeAvi]] — the profile
    * [[Codecs.decodeAviFrames]] extracts for real). The planted near-copy
    * (every `plantEvery`-th doc, id offset 1,000,000) applies the
    * per-frame pixel tweak to every frame — the re-encoded-with-a-logo
    * variant the majority-vote fingerprint must keep pairing.
    */
  def synthVideoBlobs(df: DataFrame, idCol: String, textCol: String,
      plantEvery: Int = 4): Dataset[MediaBlob] = memoSynth("video", df, plantEvery) {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val seed = text.hashCode.toLong & 0xffffffffL
        val base = MediaBlob(id, "video",
          Codecs.encodeAvi(32, 32, 40000,
            Codecs.motionFrames(seed, tweak = false, nFrames = 4)),
          "video/avi", 32, 32, 160L)
        if (id % plantEvery == 0)
          Seq(base, base.copy(media_id = id + 1000000L,
            content = Codecs.encodeAvi(32, 32, 40000,
              Codecs.motionFrames(seed, tweak = true, nFrames = 4))))
        else Seq(base)
      }
  }

  /** Deterministic REAL-WAV corpus from a text table — the audio twin of
    * [[synthRasterBlobs]]: one 16-bit mono WAV per doc (8 kHz, 0.5 s), a
    * mix of three seed-derived tones with a seed-derived loudness
    * envelope; every `plantEvery`-th doc also plants a near-copy (id
    * offset 1,000,000) at 70% amplitude with small deterministic noise —
    * exactly the re-encode/re-master variant [[Codecs.audioFp64]]'s
    * scale-invariant sign bits are built to keep pairing.
    */
  def synthAudioBlobs(df: DataFrame, idCol: String, textCol: String,
      plantEvery: Int = 4): Dataset[MediaBlob] = memoSynth("audio", df, plantEvery) {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val seed = text.hashCode.toLong & 0xffffffffL
        def mix(z0: Long): Long = {
          var z = z0
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val n = 4000 // 0.5 s at 8 kHz
        // three tones in the fingerprint's band range, seed-placed
        val freqs = (0 until 3).map(t =>
          0.05 + (mix(seed + t) & 0xffff).toDouble / 0xffff.toDouble * 0.45)
        val amps = (0 until 3).map(t =>
          0.2 + (mix(seed + 100 + t) & 0xffff).toDouble / 0xffff.toDouble * 0.8)
        def samples(scale: Double, noise: Boolean): Array[Short] =
          Array.tabulate(n) { i =>
            var v = 0.0
            var t = 0
            while (t < 3) {
              v += amps(t) * math.sin(math.Pi * freqs(t) * i); t += 1
            }
            // slow seed-derived loudness envelope → inter-frame energy
            // trends, the quantity the fingerprint signs
            v *= 0.6 + 0.4 * math.sin(2.0 * math.Pi * i / n +
              (mix(seed + 7) & 0xff).toDouble / 40.0)
            val nz = if (noise)
              ((mix(seed + i) & 0xff).toDouble - 127.5) * 0.25
            else 0.0
            val s = scale * v * 8000.0 + nz
            math.max(-32768.0, math.min(32767.0, s)).toShort
          }
        val base = MediaBlob(id, "audio",
          Codecs.encodeWav16(samples(1.0, noise = false), 8000),
          "audio/wav", -1, -1, 500L)
        if (id % plantEvery == 0)
          Seq(base, base.copy(media_id = id + 1000000L,
            content = Codecs.encodeWav16(samples(0.7, noise = true), 8000)))
        else Seq(base)
      }
  }
}
