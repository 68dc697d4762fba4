package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Distributed BPE trainer (ext/Bpe.scala) against a sequential reference
  * implementation of Sennrich et al.'s algorithm written independently
  * here — same greedy left-to-right merge, same (count desc, pair asc)
  * tie-break — plus edge cases the fold must get right.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference ----
  private def refSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ Bpe.EndOfWord

  private def refMergeOnce(syms: Vector[String], p1: String, p2: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
        out += (p1 + p2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long], n: Int, minCount: Long = 2L)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var vocab = words.map { case (w, f) => w -> (refSymbols(w), f) }
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < n && !stop) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.values.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) stop = true
      else {
        val ((p1, p2), c) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((p1, p2, c))
        vocab = vocab.map { case (w, (s, f)) => w -> (refMergeOnce(s, p1, p2), f) }
        k += 1
      }
    }
    (merges.result(), vocab.map { case (w, (s, _)) => w -> s })
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest")

  test("train learns the reference merge sequence with deterministic ties") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val words = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (refMerges, refVocab) = refTrain(words, 10)
    val (merges, vocab) = Bpe.train(docs, "text", 10)
    assert(merges.map(m => (m.p1, m.p2, m.cnt)) == refMerges)
    val gotVocab = vocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(gotVab(gotVocab) == gotVab(refVocab))
  }
  private def gotVab(m: Map[String, Vector[String]]) = m.toSeq.sortBy(_._1)

  test("mergePair is greedy left-to-right non-overlapping") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"), Seq("x"))
      .toDF("syms")
    val got = df.select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("aa", "a")) // NOT ["a","aa"] and NOT ["aaa"]
    assert(got(1) == List("a", "b", "a", "b"))
    assert(got(2) == List("x"))
  }

  test("pairCounts weights by word frequency") {
    val vocab = Seq(("ab", 3L), ("ba", 2L)).toDF("word", "freq")
      .withColumn("syms", Bpe.initSymbols(col("word")))
    val got = Bpe.pairCounts(vocab).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "b") -> 3L, ("b", Bpe.EndOfWord) -> 3L,
      ("b", "a") -> 2L, ("a", Bpe.EndOfWord) -> 2L))
  }

  test("encode replays merges and flattens tokens in word order") {
    val train = Seq((0L, "ab ab ab cd")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(train, "text", 2)
    // "ab" x3 dominates: merges are (a,b) then (ab,</w>)
    assert(merges.map(m => (m.p1, m.p2)) ==
      Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
    val got = Bpe.encode(
        Seq((7L, "ab cd ab"), (8L, ""), (9L, "  ")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(7L) == List(
      "ab</w>", "c", "d", Bpe.EndOfWord, "ab</w>"))
    // wordless docs keep their row with an empty token array — callers
    // zip/join encode output back against the corpus one-to-one
    assert(got(8L) == Nil && got(9L) == Nil)
    assert(got.size == 3)
  }

  test("save/load round-trips the merge table in rank order") {
    val train = Seq((0L, "ab ab ab cd cd")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(train, "text", 3)
    val path = tmpDir("bpe-model")
    Bpe.save(merges, path, spark)
    assert(Bpe.load(spark, path) == merges)
    // a loaded table encodes identically
    val docs = Seq((7L, "ab cd")).toDF("doc_id", "text")
    val a = Bpe.encode(docs, "doc_id", "text", merges)
      .collect().head.getSeq[String](1)
    val b = Bpe.encode(docs, "doc_id", "text", Bpe.load(spark, path))
      .collect().head.getSeq[String](1)
    assert(a == b)
  }

  test("encodeWithVocab: trainer's vocabulary is the same-corpus fast path") {
    // encoding the training corpus through the trainer's final vocabulary
    // must equal the replay path exactly — token for token, row for row
    val corpus = Seq((0L, "ab ab ab cd"), (1L, "cd ab"), (2L, ""))
      .toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(corpus, "text", 2)
    val viaReplay = Bpe.encode(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val viaVocab = Bpe.encodeWithVocab(corpus, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(viaVocab == viaReplay)
    assert(viaVocab(0L).nonEmpty && viaVocab(2L) == Nil)
  }

  test("fertility is >= 1 per word and decreases monotonically with merges") {
    // BPE never merges across word boundaries, so every word costs at
    // least one token: total tokens >= total words => fertility >= 1.
    // More merges can only shorten (or keep) each word's encoding.
    val corpus = Seq(
      (0L, "banana band bandana ban"),
      (1L, "banana banana band"),
      (2L, "drum drummer banana")).toDF("doc_id", "text")
    val words = corpus.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").count()
    def totalTokens(nMerges: Int): Long = {
      val (_, vocab) = Bpe.train(corpus, "text", nMerges)
      Bpe.encodeWithVocab(corpus, "doc_id", "text", vocab)
        .select(sum(size(col("tokens")))).collect()(0).getLong(0)
    }
    val t = Seq(0, 2, 5, 10).map(totalTokens)
    assert(t.forall(_ >= words), s"tokens $t vs words $words")
    assert(t.zip(t.tail).forall { case (a, b) => a >= b },
      s"token totals must be non-increasing in merges: $t")
  }

  test("fuzz: train matches the sequential reference on random corpora") {
    // seeded corpora over an adversarial mini-vocab (overlapping symbols,
    // repeated chars) — the merge sequence, counts and tie-breaks must
    // agree with the reference at every step
    val rnd = new scala.util.Random(7)
    val vocabW = Vector("ab", "ba", "abc", "aab", "bb", "a", "b", "cab")
    for (iter <- 0 until 5) {
      val docs = (0 until 6).map(i => (i.toLong,
        Seq.fill(3 + rnd.nextInt(8))(vocabW(rnd.nextInt(vocabW.size)))
          .mkString(" ")))
      val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val (refMerges, _) = refTrain(words, 8)
      val (merges, _) = Bpe.train(docs.toDF("doc_id", "text"), "text", 8)
      assert(merges.map(m => (m.p1, m.p2, m.cnt)) == refMerges,
        s"iter $iter corpus ${docs.map(_._2)}")
    }
  }

  test("train stops early when no pair reaches minCount") {
    val docs = Seq((0L, "xy")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, "text", 5, minCount = 2L)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("trainLocal equals the distributed trainer: merges and final vocab") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (dMerges, dVocab) = Bpe.train(docs, "text", 10)
    val (lMerges, lVocab) = Bpe.trainLocal(docs, "text", 10)
    assert(lMerges == dMerges)
    def vocabMap(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(vocabMap(lVocab) == vocabMap(dVocab))
    // and the random-corpus fuzz from the distributed trainer holds here too
    val rnd = new scala.util.Random(13)
    val vocabW = Vector("ab", "ba", "abc", "aab", "bb", "a", "b", "cab")
    for (iter <- 0 until 5) {
      val fuzz = (0 until 6).map(i => (i.toLong,
        Seq.fill(3 + rnd.nextInt(8))(vocabW(rnd.nextInt(vocabW.size)))
          .mkString(" ")))
      val words = fuzz.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val (refMerges, _) = refTrain(words, 8)
      val (got, _) = Bpe.trainLocal(fuzz.toDF("doc_id", "text"), "text", 8)
      assert(got.map(m => (m.p1, m.p2, m.cnt)) == refMerges,
        s"iter $iter corpus ${fuzz.map(_._2)}")
    }
  }

  test("trainLocal runs O(1) Spark jobs however many merges") {
    // a 1,000-merge train must not run a job per merge (the distributed
    // trainer's weakness at production vocab sizes)
    val rnd = new scala.util.Random(42)
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(30)(
        Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(6)).toChar)
          .mkString).mkString(" "))
    }.toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (merges, _) = Bpe.trainLocal(docs, "text", 1000, minCount = 1L)
      // listener delivery is async; give the bus a moment to drain
      Thread.sleep(1500)
      assert(merges.nonEmpty)
      assert(jobs.get() <= 4,
        s"expected O(1) Spark jobs for a 1,000-merge train, got ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("trainLocal maxWords truncation keeps the frequency head") {
    // with maxWords below the vocab size, only the most frequent words
    // feed merge statistics — the standard coverage cutoff
    val docs = Seq((0L, "aa aa aa aa zz")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainLocal(docs, "text", 5, maxWords = 1)
    // tie-break picks (a, </w>) first ('<' < 'a'), then (a, a</w>): the
    // retained word fully collapses, and nothing from the excluded tail
    // ever feeds a merge
    assert(merges.map(m => (m.p1, m.p2)) ==
      Seq(("a", Bpe.EndOfWord), ("a", "a" + Bpe.EndOfWord)))
    assert(!merges.exists(m => m.p1.contains("z") || m.p2.contains("z")))
    // but the excluded tail stays ENCODABLE: the returned vocabulary
    // appends it as single-char fallback rows, so encodeWithVocab keeps
    // the losslessness contract bpe_encode_check pins
    val byWord = vocab.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](2)).toMap
    assert(byWord.keySet == Set("aa", "zz"))
    assert(byWord("aa") == Seq("aa" + Bpe.EndOfWord))
    assert(byWord("zz") == Seq("z", "z", Bpe.EndOfWord))
    val enc = Bpe.encodeWithVocab(docs, "doc_id", "text", vocab)
    assert(enc.collect().head.getSeq[String](1) ==
      Seq("aa" + Bpe.EndOfWord, "aa" + Bpe.EndOfWord,
        "aa" + Bpe.EndOfWord, "aa" + Bpe.EndOfWord,
        "z", "z", Bpe.EndOfWord))
  }
}
