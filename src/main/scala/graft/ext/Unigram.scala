package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece `unigram`
  * model), distributed with the same corpus-collapse discipline as [[Bpe]]:
  * the corpus is scanned ONCE into the Zipf-bounded (word, freq) table,
  * and every EM iteration is one narrow pass over that table — a per-word
  * forward–backward over the segmentation lattice (bounded: word length ×
  * max piece length cells) followed by a map-side-combinable expected-count
  * aggregate. The piece inventory is driver-bounded by construction
  * (`seedSize` entries), so the model broadcast is small; nothing
  * proportional to the corpus ever reaches the driver.
  *
  * Differences from BPE worth knowing: BPE grows a vocabulary bottom-up by
  * greedy merges; unigram starts from an over-complete seed (all frequent
  * substrings) and SHRINKS it by EM + pruning, which yields a probabilistic
  * model that can score alternative segmentations (the basis of subword
  * regularization). Pruning here uses the standard expected-count
  * approximation of Kudo's likelihood-loss criterion: pieces the E-step
  * barely uses are dropped first (single characters are never dropped, so
  * every word stays segmentable).
  *
  * Float caveat: expected counts are cross-partition double sums, so probs
  * can wiggle at the last ulp across cluster layouts — fine for a
  * probabilistic model (UnigramSpec compares against a sequential
  * reference with tolerance; Viterbi OUTPUT is far from tie boundaries on
  * real corpora). Nothing downstream hash-compares the probs.
  */
object Unigram {

  /** A learned sentence piece with its log probability. */
  final case class Piece(piece: String, logp: Double)

  /** The trained model: pieces sorted by (logp desc, piece), plus the
    * floor log-prob charged to unknown single characters at encode time.
    */
  final case class Model(pieces: Seq[Piece], unkLogp: Double) {
    @transient lazy val logpOf: Map[String, Double] =
      pieces.map(p => p.piece -> p.logp).toMap
    def maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.piece.length).max
  }

  /** Seed inventory: every substring of length 1..maxPieceLen of every
    * word, weighted by word frequency; keep ALL single characters plus
    * the top multi-char substrings by (weight desc, piece) up to
    * `seedSize`. One explode + one map-side-combined aggregate over the
    * WORD table (vocabulary-sized, never the corpus), then a bounded
    * collect (≤ seedSize rows by construction).
    */
  def seedPieces(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val subs = words.as[(String, Long)].flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), f)
    }.toDF("piece", "w")
      .groupBy("piece").agg(sum("w").as("weight"))
    val chars = subs.where(length(col("piece")) === 1)
      .orderBy(col("weight").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multi = subs.where(length(col("piece")) > 1)
      .orderBy(col("weight").desc, col("piece"))
      .limit(math.max(0, seedSize - chars.length))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (chars ++ multi).toSeq
  }

  /** Forward–backward expected piece counts for one word under the
    * current probabilities — the E-step cell. Bounded O(|w| · maxLen)
    * lattice; every single char is in the vocab, so α(n) > 0 always.
    * Returns (piece → expected count · freq).
    */
  private[graft] def expectedCounts(word: String, freq: Long,
      logp: Map[String, Double], maxLen: Int): Seq[(String, Double)] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val p = (s: String) => logp.get(s).map(math.exp)
    val alpha = new Array[Double](n + 1); alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var a = 0.0
      var i = math.max(0, j - maxLen)
      while (i < j) {
        p(word.substring(i, j)).foreach(pp => a += alpha(i) * pp)
        i += 1
      }
      alpha(j) = a
      j += 1
    }
    if (alpha(n) <= 0.0) return Seq.empty // unsegmentable (no char probs)
    val beta = new Array[Double](n + 1); beta(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var b = 0.0
      var jj = i + 1
      val end = math.min(n, i + maxLen)
      while (jj <= end) {
        p(word.substring(i, jj)).foreach(pp => b += pp * beta(jj))
        jj += 1
      }
      beta(i) = b
      i -= 1
    }
    val out = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    i = 0
    while (i < n) {
      var jj = i + 1
      val end = math.min(n, i + maxLen)
      while (jj <= end) {
        val s = word.substring(i, jj)
        p(s).foreach { pp =>
          out(s) += freq.toDouble * alpha(i) * pp * beta(jj) / alpha(n)
        }
        jj += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** One distributed E+M step: expected counts over the word table
    * (flatMap + map-side-combined sum, collected bounded by the piece
    * inventory), normalized into new log probabilities.
    */
  def emStep(words: DataFrame, logp: Map[String, Double],
      maxLen: Int): Map[String, Double] = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(logp)
    val counts = words.as[(String, Long)]
      .flatMap { case (w, f) => expectedCounts(w, f, bc.value, maxLen) }
      .toDF("piece", "c")
      .groupBy("piece").agg(sum("c").as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val total = counts.map(_._2).sum
    val cm = counts.toMap
    // pieces with zero expected count keep a floor so log stays finite
    // until the prune pass removes them
    val floor = 1e-10
    logp.map { case (s, _) =>
      s -> math.log(math.max(cm.getOrElse(s, 0.0), floor) / total)
    }
  }

  /** Train a unigram-LM piece inventory of (at most) `vocabSize` pieces.
    * Shrink loop: `emIters` EM steps, then prune the lowest-expected-use
    * multi-char pieces (never characters) by `pruneFactor`, until the
    * inventory fits; one final EM settles the probabilities.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 2000, emIters: Int = 2,
      pruneFactor: Double = 0.75): Model = {
    val words = Bpe.wordFreqs(docs, textCol).localCheckpoint()
    val seed = seedPieces(words, maxPieceLen, seedSize)
    val totalW = seed.map(_._2.toDouble).sum
    var logp: Map[String, Double] =
      seed.map { case (s, w) => s -> math.log(w.toDouble / totalW) }.toMap
    var iterGuard = 0
    while (logp.size > vocabSize && iterGuard < 32) {
      (0 until emIters).foreach(_ => logp = emStep(words, logp, maxPieceLen))
      val (chars, multi) = logp.partition(_._1.length == 1)
      val keepMulti = math.max(0,
        math.min((multi.size * pruneFactor).toInt,
          vocabSize - chars.size))
      val kept = multi.toSeq
        .sortBy { case (s, lp) => (-lp, s) } // highest prob survives
        .take(keepMulti)
      logp = chars ++ kept
      iterGuard += 1
    }
    logp = emStep(words, logp, maxPieceLen)
    val pieces = logp.toSeq.sortBy { case (s, lp) => (-lp, s) }
      .map { case (s, lp) => Piece(s, lp) }
    Model(pieces, unkLogp = math.log(1e-10))
  }

  /** Train driver-side over the collected word table — the fast path for
    * production vocab sizes, mirroring [[Bpe.trainLocal]]. [[train]] runs
    * `emIters × shrink-rounds` distributed EM jobs (bounded ≤ 64, but
    * still serial driver-synchronized passes); SentencePiece itself
    * trains sequentially over exactly this Zipf-bounded word table, so
    * once it is collected (ONE Spark job — the same
    * TakeOrderedAndProject-shaped bound as `Bpe.trainLocal`), the whole
    * seed + EM + prune loop runs in memory: zero Spark jobs per
    * iteration. Distributed encode/encodeSampled are unchanged.
    *
    * Equality vs [[train]] is APPROXIMATE by nature: expected counts are
    * double sums whose order differs between the map-side-combined
    * distributed aggregate and this sequential loop — probs agree to
    * ~1e-9 relative (UnigramSpec pins piece-set equality and prob
    * tolerance), and Viterbi output is far from tie boundaries on real
    * corpora. `maxWords` below the vocabulary size trains on the
    * frequency head only — encode still covers every word (single chars
    * ride at the unk floor; nothing is dropped).
    */
  def trainLocal(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 2000, emIters: Int = 2,
      pruneFactor: Double = 0.75, maxWords: Int = 1 << 22): Model = {
    // the one Spark job: the Zipf-bounded (word, freq) head
    val words: Array[(String, Long)] = Bpe.wordFreqs(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // sequential seed: identical ordering contract to [[seedPieces]]
    // (weight desc, piece; all single chars kept first)
    val weight = scala.collection.mutable.HashMap.empty[String, Long]
      .withDefaultValue(0L)
    words.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val maxL = math.min(maxPieceLen, w.length - i)
        while (l <= maxL) {
          val s = w.substring(i, i + l)
          weight(s) += f
          l += 1
        }
        i += 1
      }
    }
    val (charsW, multiW) = weight.toSeq.partition(_._1.length == 1)
    val ord = Ordering.Tuple2(Ordering.Long.reverse, Ordering.String)
    val chars = charsW.sortBy { case (s, w) => (w, s) }(ord).take(seedSize)
    val multi = multiW.sortBy { case (s, w) => (w, s) }(ord)
      .take(math.max(0, seedSize - chars.length))
    val seed = chars ++ multi

    def emLocal(logp: Map[String, Double]): Map[String, Double] = {
      val counts = scala.collection.mutable.HashMap.empty[String, Double]
        .withDefaultValue(0.0)
      words.foreach { case (w, f) =>
        expectedCounts(w, f, logp, maxPieceLen)
          .foreach { case (s, c) => counts(s) += c }
      }
      val total = counts.valuesIterator.sum
      val floor = 1e-10
      logp.map { case (s, _) =>
        s -> math.log(math.max(counts(s), floor) / total)
      }
    }

    // identical shrink loop to [[train]], EM swapped for the local step
    val totalW = seed.map(_._2.toDouble).sum
    var logp: Map[String, Double] =
      seed.map { case (s, w) => s -> math.log(w.toDouble / totalW) }.toMap
    var iterGuard = 0
    while (logp.size > vocabSize && iterGuard < 32) {
      (0 until emIters).foreach(_ => logp = emLocal(logp))
      val (cs, ms) = logp.partition(_._1.length == 1)
      val keepMulti = math.max(0,
        math.min((ms.size * pruneFactor).toInt, vocabSize - cs.size))
      val kept = ms.toSeq
        .sortBy { case (s, lp) => (-lp, s) }
        .take(keepMulti)
      logp = cs ++ kept
      iterGuard += 1
    }
    logp = emLocal(logp)
    val pieces = logp.toSeq.sortBy { case (s, lp) => (-lp, s) }
      .map { case (s, lp) => Piece(s, lp) }
    Model(pieces, unkLogp = math.log(1e-10))
  }

  /** Viterbi segmentation of one word under the model: the max-log-prob
    * piece sequence; characters outside the inventory are emitted as
    * single-char pieces at the unk floor (nothing is dropped).
    */
  private[graft] def viterbi(word: String, m: Model): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val maxLen = m.maxPieceLen
    val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        val s = word.substring(i, j)
        val lp =
          if (j - i == 1) m.logpOf.getOrElse(s, m.unkLogp)
          else m.logpOf.getOrElse(s, Double.NegativeInfinity)
        if (lp > Double.NegativeInfinity && best(i) + lp > best(j)) {
          best(j) = best(i) + lp; back(j) = i
        }
        i += 1
      }
      j += 1
    }
    val out = List.newBuilder[String]
    val stack = scala.collection.mutable.Stack.empty[String]
    var pos = n
    while (pos > 0) { stack.push(word.substring(back(pos), pos)); pos = back(pos) }
    out ++= stack
    out.result()
  }

  /** Tokenize a corpus under a trained model: one narrow pass, the model
    * broadcast. Output (id, tokens) with the word structure flattened —
    * exactly the shape [[Bpe.encodeWithVocab]] produces.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      m: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    // fanOut: the Viterbi pass is per-row compute; a one-split corpus
    // otherwise tokenizes serially (Compute.fanOut doc)
    Compute.fanOut(
      docs.select(col(idCol).cast("long"), col(textCol))
        .where(col(idCol).isNotNull && col(textCol).isNotNull),
      col(idCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, text.split(" ").filter(_.nonEmpty).toSeq
          .flatMap(w => viterbi(w, bc.value)))
      }
      .toDF(idCol, "tokens")
  }

  /** One SAMPLED segmentation of a word — subword regularization
    * (Kudo 2018 §3): draw a path from the exact posterior over
    * segmentations with piece probabilities sharpened by `alpha`
    * (p^α; α→∞ recovers Viterbi, α→0 approaches uniform over paths).
    * Forward-filter backward-sample over the same bounded lattice as the
    * E-step; `u(pos)` supplies the uniform draw for the step ending at
    * `pos` — injected so callers can make sampling DETERMINISTIC (the
    * encode pass hashes (doc, word index, pos, salt), so a corpus
    * re-tokenizes identically on any cluster layout, yet different
    * salts/epochs yield genuinely different segmentations).
    */
  private[graft] def sampleSegmentation(word: String, m: Model,
      alpha: Double, u: Int => Double): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val maxLen = m.maxPieceLen
    def q(s: String): Double = {
      val lp =
        if (s.length == 1) m.logpOf.getOrElse(s, m.unkLogp)
        else m.logpOf.getOrElse(s, Double.NegativeInfinity)
      if (lp == Double.NegativeInfinity) 0.0 else math.exp(alpha * lp)
    }
    val fwd = new Array[Double](n + 1); fwd(0) = 1.0
    var j = 1
    while (j <= n) {
      var a = 0.0
      var i = math.max(0, j - maxLen)
      while (i < j) { a += fwd(i) * q(word.substring(i, j)); i += 1 }
      fwd(j) = a
      j += 1
    }
    if (fwd(n) <= 0.0) return word.map(_.toString) // degenerate fallback
    var pos = n
    val acc = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) {
      val lo = math.max(0, pos - maxLen)
      val draw = u(pos) * fwd(pos)
      var i = lo
      var cum = 0.0
      var chosen = -1
      while (i < pos && chosen < 0) {
        cum += fwd(i) * q(word.substring(i, pos))
        if (draw < cum) chosen = i
        i += 1
      }
      if (chosen < 0) chosen = pos - 1 // float-edge guard: last candidate
      acc.prepend(word.substring(chosen, pos))
      pos = chosen
    }
    acc.toList
  }

  /** Tokenize with SAMPLED segmentations (subword regularization): the
    * per-step uniforms are salted XXH64 draws over (doc id, word index,
    * lattice position), so the pass is bit-deterministic for a given
    * `salt` and partitioning-invariant — change the salt per epoch to get
    * fresh segmentations, exactly how sampled tokenization is used in
    * training loops. Same narrow broadcast-model shape as [[encode]].
    */
  def encodeSampled(docs: DataFrame, idCol: String, textCol: String,
      m: Model, alpha: Double = 0.5, salt: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    def hl(v: Long, seed: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed)
    // fanOut: same serial-tokenize guard as [[encode]]; the sampled path
    // is already partitioning-invariant by its salted-hash construction
    Compute.fanOut(
      docs.select(col(idCol).cast("long"), col(textCol))
        .where(col(idCol).isNotNull && col(textCol).isNotNull),
      col(idCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        val toks = words.iterator.zipWithIndex.flatMap { case (w, wi) =>
          sampleSegmentation(w, bc.value, alpha, pos => {
            val h = hl(pos.toLong, hl(wi.toLong, hl(id, salt)))
            // top 53 bits → uniform double in [0, 1)
            (h >>> 11).toDouble / (1L << 53).toDouble
          })
        }.toSeq
        (id, toks)
      }
      .toDF(idCol, "tokens")
  }

  /** Persist a trained model — the offline-train → online-encode seam
    * (the [[Lm.save]] twin): one tiny parquet of (piece, logp) rows plus
    * the unk floor as a single-row table, so any later session can
    * [[load]] and broadcast it without retraining.
    */
  def save(m: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    m.pieces.toDF("piece", "logp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pieces")
    Seq(m.unkLogp).toDF("unk_logp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a model persisted by [[save]] (order restored: logp desc,
    * piece — the driver-side inventory is bounded by construction).
    */
  def load(spark: SparkSession, path: String): Model = {
    val pieces = spark.read.parquet(s"$path/pieces")
      .collect().map(r => Piece(r.getAs[String]("piece"),
        r.getAs[Double]("logp")))
      .sortBy(p => (-p.logp, p.piece)).toSeq
    val unk = spark.read.parquet(s"$path/meta")
      .collect().head.getAs[Double]("unk_logp")
    Model(pieces, unk)
  }

  /** Mean corpus log-likelihood per word under the model (the quantity EM
    * ascends) — one pass over the word table; UnigramSpec uses it to pin
    * EM monotonicity.
    */
  def corpusLogLikelihood(words: DataFrame, m: Model): Double = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    val agg = words.as[(String, Long)].map { case (w, f) =>
      val mm = bc.value
      val maxLen = mm.maxPieceLen
      val n = w.length
      val alpha = new Array[Double](n + 1); alpha(0) = 1.0
      var j = 1
      while (j <= n) {
        var a = 0.0
        var i = math.max(0, j - maxLen)
        while (i < j) {
          mm.logpOf.get(w.substring(i, j))
            .foreach(lp => a += alpha(i) * math.exp(lp))
          i += 1
        }
        alpha(j) = a
        j += 1
      }
      (if (alpha(n) > 0) f.toDouble * math.log(alpha(n)) else 0.0,
        f.toDouble)
    }.toDF("ll", "f").agg(sum("ll"), sum("f")).head()
    agg.getDouble(0) / agg.getDouble(1)
  }
}
