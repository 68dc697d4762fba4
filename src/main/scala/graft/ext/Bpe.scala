package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016),
  * distributed the way corpus-scale BPE trainers actually run: the corpus
  * collapses ONCE to a (word, freq) vocabulary table — Zipf-bounded, orders
  * of magnitude smaller than the corpus — and every merge iteration is two
  * narrow passes over that table (a map-side-combinable pair-count
  * aggregate and a per-word fold applying the winning merge). The corpus
  * itself is never rescanned after the first pass, so 100 TB of text costs
  * one word-count shuffle total; N merges cost N vocabulary-table jobs.
  *
  * The per-iteration argmax collects exactly ONE row to the driver (the
  * winning pair) — bounded by construction, like the reorg header walk.
  * Lineage is cut with an eager localCheckpoint each iteration (the table
  * is vocabulary-sized); without it the plan nests one fold per merge and
  * codegen depth explodes.
  *
  * Symbols are Java chars (the synthetic corpus is ASCII; astral-plane
  * text would need a codepoint split) plus the standard `</w>` end-of-word
  * marker so merges never cross word boundaries.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** (word, freq) vocabulary table — the one corpus-wide pass. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: one symbol per char, then the
    * end-of-word marker. Spark's split("", limit=-1) keeps the trailing
    * zero-width match as an empty string (Java split semantics; DuckDB's
    * string_split does not) — filtered here so both engines and the
    * sequential reference agree on the symbol sequence.
    */
  def initSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => s =!= ""), array(lit(EndOfWord)))

  /** Adjacent-pair counts over the current symbol sequences, weighted by
    * word frequency — the quantity BPE maximizes each round. Shuffle-free
    * slice-zip expansion (no window), one map-side-combined aggregate.
    */
  def pairCounts(vocab: DataFrame, symsCol: String = "syms",
      freqCol: String = "freq"): DataFrame = {
    vocab
      .select(col(freqCol),
        explode(Dedup.slidingZip(col(symsCol), 2)).as("pr"))
      .select(col("pr").getField("0").as("p1"),
        col("pr").getField("1").as("p2"), col(freqCol))
      .groupBy("p1", "p2").agg(sum(col(freqCol)).as("cnt"))
  }

  /** Merge every LEFT-TO-RIGHT, NON-OVERLAPPING adjacent (p1, p2)
    * occurrence inside a symbol array — the standard greedy BPE merge,
    * as a left fold: append each symbol, except when the accumulator's
    * last symbol is p1 and the incoming one is p2, in which case replace
    * the last with their concatenation. Non-overlap falls out naturally:
    * the merged token no longer equals p1, so "a a a" under ("a","a")
    * gives ["aa","a"], exactly like the sequential algorithm. Nested
    * `when` (CaseWhen short-circuits branch evaluation) keeps the
    * ANSI-unsafe element_at(-1) away from empty accumulators.
    */
  def mergePair(symsCol: Column, p1: String, p2: String): Column =
    aggregate(
      symsCol,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) === 0, array(s))
          .otherwise(when(
            element_at(acc, -1) === lit(p1) && s === lit(p2),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), s))))
            .otherwise(concat(acc, array(s)))))

  /** One learned merge: the pair, its count when chosen, and its rank. */
  final case class Merge(p1: String, p2: String, cnt: Long, rank: Int)

  /** Train `numMerges` BPE merges over the corpus. Ties on count break
    * lexicographically on (p1, p2) — deterministic across partitionings,
    * so the learned table is reproducible run to run. Stops early when no
    * pair occurs at least `minCount` times.
    *
    * @return the merge table (driver-side — it IS the model, numMerges
    *         rows) and the final (word, freq, syms) vocabulary table.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L): (Seq[Merge], DataFrame) = {
    var vocab = wordFreqs(docs, textCol)
      .withColumn("syms", initSymbols(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(vocab)
        .where(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (p1, p2, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(p1, p2, cnt, rank)
        // only words containing the pair change; the fold is cheap but the
        // checkpoint each round keeps lineage (and codegen depth) flat
        vocab = vocab
          .withColumn("syms", mergePair(col("syms"), p1, p2))
          .localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Train driver-side over the collected word table — the fast path for
    * production vocab sizes. [[train]] runs one argmax-collect Spark job
    * (plus a localCheckpoint) per merge: fine for tens of merges, but a
    * 32–64 k-merge production vocabulary is 64 k serial driver-synchronized
    * jobs — latency-bound regardless of cluster size. This path exploits
    * the same observation the corpus-collapse already relies on (and that
    * sequential trainers like SentencePiece are built on): the (word, freq)
    * table is Zipf-bounded and orders of magnitude smaller than the corpus.
    * So: ONE Spark job collects the top-`maxWords` words by frequency
    * (TakeOrderedAndProject, no global sort), then the classic incremental
    * pair-count/heap trainer runs sequentially on the driver — zero Spark
    * jobs per merge. Distributed encode ([[encode]]/[[encodeWithVocab]])
    * is unchanged.
    *
    * Bit-equal to [[train]] (same greedy argmax, same (cnt desc, p1, p2)
    * tie-break — ASCII corpora; UTF-16 vs UTF-8 order can differ on astral
    * chars) whenever `maxWords` covers the full vocabulary; with a smaller
    * `maxWords` it is the standard frequency-coverage approximation: the
    * rare-word tail is excluded from merge STATISTICS but stays encodable
    * — the returned vocabulary appends the tail as single-char fallback
    * rows so encodeWithVocab never drops a word.
    *
    * @return the merge table and the final (word, freq, syms) vocabulary
    *         (retained words merged, any excluded tail as single-char
    *         fallback rows), covering every corpus word for encode.
    */
  def trainLocal(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, maxWords: Int = 1 << 22): (Seq[Merge], DataFrame) = {
    val spark = docs.sparkSession
    // the one Spark job: Zipf-bounded word table, frequency-covering top-M
    val collected = wordFreqs(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect()
    val words = collected.map(_.getString(0))
    val freqs = collected.map(_.getLong(1))
    val syms: Array[Array[String]] =
      words.map(w => w.split("").filter(_.nonEmpty) :+ EndOfWord)

    // sequential twin of mergePair's left fold (left-to-right,
    // non-overlapping)
    def mergeSeq(s: Array[String], p1: String, p2: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      s.foreach { x =>
        if (out.nonEmpty && out.last == p1 && x == p2)
          out(out.length - 1) = p1 + p2
        else out += x
      }
      out.toArray
    }

    type Pair = (String, String)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val where = scala.collection.mutable.HashMap
      .empty[Pair, scala.collection.mutable.HashSet[Int]]
    def pairsIn(s: Array[String]): Iterator[Pair] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    // max-heap with lazy deletion: (cnt desc, p1 asc, p2 asc); stale
    // entries (count changed since push) are discarded on pop
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      (a: (Long, String, String), b: (Long, String, String)) => {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c
        else {
          val c1 = a._2.compareTo(b._2)
          if (c1 != 0) c1 else a._3.compareTo(b._3)
        }
      })
    syms.indices.foreach { i =>
      pairsIn(syms(i)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + freqs(i)
        where.getOrElseUpdate(p,
          scala.collection.mutable.HashSet.empty[Int]) += i
      }
    }
    counts.foreach { case (p, c) => heap.add((c, p._1, p._2)) }

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // pop to the first non-stale entry meeting minCount
      var top: (Long, String, String) = null
      while (top == null && !heap.isEmpty) {
        val h = heap.poll()
        if (counts.getOrElse((h._2, h._3), 0L) == h._1 && h._1 >= minCount)
          top = h
      }
      if (top == null) done = true
      else {
        val (cnt, p1, p2) = top
        merges += Merge(p1, p2, cnt, rank)
        val touched = scala.collection.mutable.HashSet.empty[Pair]
        val affected = where.getOrElse((p1, p2), Set.empty[Int]).toArray
        affected.foreach { i =>
          val f = freqs(i)
          pairsIn(syms(i)).foreach { p =>
            counts(p) = counts(p) - f
            where(p) -= i
            touched += p
          }
          syms(i) = mergeSeq(syms(i), p1, p2)
          pairsIn(syms(i)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + f
            where.getOrElseUpdate(p,
              scala.collection.mutable.HashSet.empty[Int]) += i
            touched += p
          }
        }
        touched.foreach { p =>
          val c = counts.getOrElse(p, 0L)
          if (c <= 0L) { counts.remove(p); where.remove(p) }
          else heap.add((c, p._1, p._2))
        }
        rank += 1
      }
    }

    import spark.implicits._
    val rows: Seq[(String, Long, Seq[String])] =
      words.indices.map(i => (words(i), freqs(i), syms(i).toSeq))
    val slices = math.max(1,
      math.min(spark.sparkContext.defaultParallelism, rows.size))
    val retained = spark.sparkContext.parallelize(rows, slices)
      .toDF("word", "freq", "syms")
    // Losslessness with maxWords below the vocabulary size: the rare-word
    // tail was excluded from MERGE STATISTICS, but encodeWithVocab
    // inner-joins on word — returning only retained rows would silently
    // DROP excluded words from the token stream (bpe_encode_check pins
    // detokenize(encode(x)) == x). Append the tail as single-char
    // fallback rows (unmerged, like any OOV fallback): distributed
    // anti-join, no extra driver collect, and skipped entirely when the
    // collect wasn't truncated.
    val vocabDf =
      if (collected.length < maxWords) retained
      else retained.unionByName(
        wordFreqs(docs, textCol)
          .join(retained.select("word"), Seq("word"), "left_anti")
          .withColumn("syms", initSymbols(col("word")))
          .select("word", "freq", "syms"))
    (merges.result(), vocabDf)
  }

  /** Persist a learned merge table — the offline-train → online-encode
    * seam ([[Unigram.save]] / [[Lm.save]] twin): numMerges tiny rows,
    * rank order restored on [[load]].
    */
  def save(merges: Seq[Merge], path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    merges.toDF("p1", "p2", "cnt", "rank")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
  }

  /** Load a merge table persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] =
    spark.read.parquet(s"$path/merges")
      .collect().map(r => Merge(r.getAs[String]("p1"),
        r.getAs[String]("p2"), r.getAs[Long]("cnt"), r.getAs[Int]("rank")))
      .sortBy(_.rank).toSeq

  /** Tokenize a corpus under a learned merge table: rebuild the (word,
    * freq) vocabulary of THIS corpus, replay the merges in rank order
    * (distributed — merges × vocabulary-table passes, the corpus itself is
    * touched once), then map each document's words through the resulting
    * word→tokens dictionary and flatten in word order. Checkpoints every
    * `checkpointEvery` merges bound lineage depth. Every input document
    * gets exactly one output row — a doc with no non-empty words (empty
    * or all-space text) tokenizes to an EMPTY array, it does not vanish
    * (callers zip/join the output back against the corpus).
    *
    * @return (idCol, tokens array<string>), one row per input doc
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], checkpointEvery: Int = 16): DataFrame = {
    var vocab = wordFreqs(docs, textCol)
      .withColumn("syms", initSymbols(col("word")))
    merges.sortBy(_.rank).zipWithIndex.foreach { case (m, i) =>
      vocab = vocab.withColumn("syms", mergePair(col("syms"), m.p1, m.p2))
      if ((i + 1) % checkpointEvery == 0) vocab = vocab.localCheckpoint()
    }
    encodeWithVocab(docs, idCol, textCol, vocab)
  }

  /** Tokenize against an ALREADY-MERGED (word, syms) vocabulary — the
    * fast path when encoding the corpus the model was just trained on:
    * [[train]]'s final vocabulary IS this dictionary, so the per-merge
    * replay of [[encode]] (one fold pass per merge) is skipped entirely.
    * Words absent from `vocab` (possible when encoding a different
    * corpus) are dropped from the token stream — use [[encode]] to
    * tokenize unseen corpora under the merge table instead.
    */
  def encodeWithVocab(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val sites = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .where(col("word") =!= "")
    val tokenized = sites
      .join(vocab.select(col("word"), col("syms")), "word")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("syms"))))
        .as("ws"))
      .select(col(idCol),
        flatten(transform(col("ws"), w => w.getField("syms"))).as("tokens"))
    docs.select(col(idCol)).distinct()
      .join(tokenized, Seq(idCol), "left")
      .withColumn("tokens",
        coalesce(col("tokens"), array().cast("array<string>")))
  }
}
