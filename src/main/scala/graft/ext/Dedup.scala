package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — the four standard
  * tiers, cheapest first:
  *
  *  1. [[exact]]          — content-hash groupBy. One shuffle on a 32-byte
  *                          key; at 100 TB, hash first so the shuffle moves
  *                          digests, not documents.
  *  2. [[minHashLsh]]     — MinHash + banded LSH for near-duplicate pairs.
  *                          The classic shingle→minhash→band→bucket-join
  *                          pipeline (Broder; Leskovec et al., MMDS ch.3).
  *                          Candidate generation is a self-join on band
  *                          hash — the only quadratic step is within-bucket.
  *  3. [[simHash]]        — 64-bit SimHash fingerprints (Charikar); Hamming
  *                          proximity via 4×16-bit band blocking.
  *  4. [[ngramJaccard]]   — exact n-gram Jaccard over candidate pairs:
  *                          the expensive verifier, run only on survivors of
  *                          2/3 (here exposed standalone for the oracle).
  *
  * Everything is built on deterministic hashes (`sha2`, `xxhash64`) — no
  * RNG, so results are stable across runs, executors and retries.
  */
object Dedup {

  /** Exact dedup: group by sha256(text); keeper = min(id).
    * Returns (text_hash, n_dups, keeper).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper"))

  /** Word n-gram shingles of a text column, as a deduplicated array.
    * Per-row Column form — convenient for composition; for the hot paths
    * use [[shingleRows]], which stays inside whole-stage codegen.
    */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(textCol, " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i =>
          concat_ws(
            " ",
            (0 until n).map(j => element_at(words, i + j + 1)): _*
          )
      )
    )
  }

  /** (doc, shingle) rows, fully codegen'd and SHUFFLE-FREE: the word array
    * is zipped against its own n−1 shifted slices (`arrays_zip` of `slice`s
    * — plain expressions, not interpreted lambda HOFs), so each row expands
    * to its W−n+1 shingles in a narrow explode. This replaced an earlier
    * posexplode + window-`lead` form whose per-doc window cost a full
    * shuffle+sort before any consumer ran. With `distinct`, the closing
    * aggregate dedups within-doc shingles and is the materialization
    * barrier every consumer reuses (ReuseExchange).
    */
  def shingleRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int, distinct: Boolean = true): org.apache.spark.sql.DataFrame = {
    val words = split(col(textCol), " ")
    // each part j = words[j..], truncated to the common shingle count
    // (W−n+1; empty when W<n) so the zip never pads with nulls
    val nShingles = greatest(size(words) - (n - 1), lit(0))
    val parts = (0 until n).map(j => slice(words, lit(j + 1), nShingles))
    val rows = df
      .select(col(idCol).as("doc"), explode(arrays_zip(parts: _*)).as("z"))
      .select(col("doc"),
        concat_ws(" ", (0 until n).map(j => col(s"z.$j")): _*).as("s"))
    if (distinct) rows.distinct() else rows
  }

  /** k MinHash values per document: for seed s, min over shingles of
    * xxhash64(shingle, s). Narrow (per-row) computation — no shuffle.
    */
  def minHashSignature(shinglesCol: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      sd => array_min(transform(shinglesCol, sh => xxhash64(sh, sd)))
    )

  /** MinHash LSH candidate pairs with estimated similarity.
    *
    * @param numHashes signature length k = bands * rowsPerBand
    * @param bands     band count; a pair collides iff some band of the
    *                  signature matches exactly ⇒ P(candidate) ≈
    *                  1-(1-J^r)^b, the usual S-curve.
    * @return (id_a, id_b, est_jaccard) for candidate pairs, id_a < id_b.
    *
    * Scale: the docs→signature stage is narrow; the band explode produces
    * `bands` rows/doc; the self-join shuffles on (band, band_hash) — bucket
    * sizes are the skew risk, so pathological buckets (boilerplate docs)
    * should be salted or capped; we cap pairs per bucket implicitly by
    * distinct-ing pairs after the join.
    */
  def minHashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    // Signature via explode + k codegen'd min-aggregations, NOT the per-row
    // lambda form ([[minHashSignature]]): higher-order functions are
    // interpreted (CodegenFallback) and the nested transform costs
    // O(k·shingles) interpreted evals per row — measured 100× slower at
    // sf0.1. The groupBy also materializes the signature once (shuffle
    // barrier), so the band explode and the self-join below reuse data
    // instead of re-inlining the whole expression tree.
    val sig = shingleRows(docs, idCol, textCol, shingleN)
      .groupBy("doc")
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(col("s"), lit(i)))): _*).as("sig"))

    // explode into (doc, band, band_hash)
    val banded = sig.select(
      col("doc"),
      col("sig"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)
        )
      ).as(Seq("band", "band_hash"))
    )

    val a = banded.select(col("band"), col("band_hash"),
      col("doc").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc").as("id_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // estimated Jaccard = fraction of matching minhashes
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, lit(1.0)).otherwise(lit(0.0))),
          lit(0.0), (acc, v) => acc + v
        ) / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** 64-bit SimHash per document (Charikar): per-word xxhash64, ±1 vote per
    * bit, sign → bit. Implemented as explode + 64 conditional sums — a
    * single map-side-combinable aggregation per doc.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc"),
      explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$b")
    }
    val voted = words.groupBy("doc").agg(votes.head, votes.tail: _*)
    val fp = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select(col("doc"), fp.as("simhash"))
  }

  /** SimHash near-dup candidate pairs within Hamming distance `maxDist`,
    * blocked on 4×16-bit bands (a pair within distance 3 must agree on at
    * least one band — pigeonhole).
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val fp = simHash(docs, idCol, textCol)
    val banded = fp.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "band_val")))
    val a = banded.select(col("band"), col("band_val"),
      col("doc").as("id_a"), col("simhash").as("fp_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("doc").as("id_b"), col("simhash").as("fp_b"))
    val hamming = {
      // popcount of xor via bit_count
      bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
    }
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * (id_a, id_b, inter, union, jaccard) — the verification tier; also the
    * DuckDB-oracle-checkable face of near-dup detection.
    */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.0
  ): DataFrame = {
    // distinct-by-aggregate instead of array_distinct: the Aggregate's
    // Exchange is an identical subtree under all three consumers below
    // (counts + both self-join sides), so ReuseExchange computes the
    // interpreted shingle HOF once instead of three times (3× measured win
    // at sf0.1).
    val sh = shingleRows(docs, idCol, textCol, shingleN)
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    val pairs = sh.as("x")
      .join(sh.as("y"), col("x.s") === col("y.s") &&
        col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.withColumnRenamed("doc", "id_a")
        .withColumnRenamed("n", "n_a"), "id_a")
      .join(counts.withColumnRenamed("doc", "id_b")
        .withColumnRenamed("n", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("union"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Embedding near-dup: pairs of vectors with cosine ≥ threshold, candidate-
    * limited to shared LSH buckets (see [[Similarity.lshBucketed]]).
    */
  def embeddingNearDup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nbits: Int,
      minCosine: Double
  ): DataFrame = {
    // norms once per vector BEFORE the pair join (each vector appears in
    // many pairs; computing norm2 per pair tripled the interpreted-fold
    // work). The join then needs only one dot product per pair.
    val bucketed = Similarity.lshBucketed(embs, vecCol, dim, nbits)
      .withColumn("__norm", sqrt(Similarity.norm2(col(vecCol))))
    val a = bucketed.select(col("lsh_bucket"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"), col("__norm").as("n_a"))
    val b = bucketed.select(col("lsh_bucket"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"), col("__norm").as("n_b"))
    a.join(b, Seq("lsh_bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b"))).as("cosine"))
      .where(col("cosine") >= minCosine)
      .distinct()
  }
}
