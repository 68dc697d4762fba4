package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing here is real and tested — schema, typed Datasets,
  * batch shape, partitioning — while the actual codec calls are STUBBED
  * behind [[Codecs]] with deterministic fakes (this container has no
  * image/audio libraries). Swapping in a real decoder is a one-function
  * change; nothing in the pipeline shape moves.
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

  /** The codec boundary — STUBS. Each fake is deterministic in the input
    * bytes so tests are stable; a production build replaces these bodies
    * with real decoders (e.g. via JNI/javacpp) without touching the
    * pipeline.
    */
  object Codecs {
    val FeatureDim = 8

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

    /** STUB resize: returns a deterministic truncation of the payload
      * (stands in for a real re-encode).
      */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(content, math.min(content.length,
        math.max(16, w * h / 64)))

    /** STUB frame sampling: slices the payload into `n` chunks
      * (stands in for keyframe extraction).
      */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
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
    // executor map (the Long/String tuple encoder is non-nullable)
    df.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        MediaBlob(id, kind, bytes, s"$kind/fake", 64, 64, -1L)
      }
  }

  /** Feature extraction: one batched pass per partition; output rows are
    * small (blob stays behind).
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
          Codecs.imageFeature(m.content))
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

  /** Feature rows as a DataFrame — small, shuffle/join-friendly (payloads
    * stay behind in the blob Dataset).
    */
  def featureTable(media: Dataset[MediaBlob]): DataFrame =
    extractFeatures(media).toDF()
}
