package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Unigram}

/** Unigram-LM tokenizer: the distributed EM must match a sequential
  * forward–backward reference, EM must ascend the corpus likelihood, and
  * Viterbi must reconstruct every word exactly.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the rat"),
    (3L, "a cat and a rat sat"),
    (4L, "the mats sat flat on the rats"),
    (5L, "concatenation of cats and rats")
  ).toDF("doc_id", "text")

  /** Sequential reference of the E-step expected counts for one word. */
  private def refExpected(word: String, freq: Long,
      logp: Map[String, Double], maxLen: Int): Map[String, Double] = {
    val n = word.length
    def p(s: String) = logp.get(s).map(math.exp)
    // enumerate ALL segmentations (words are short in the fixture)
    def segs(i: Int): Seq[(Seq[String], Double)] =
      if (i == n) Seq((Seq.empty, 1.0))
      else for {
        j <- (i + 1) to math.min(n, i + maxLen)
        pp <- p(word.substring(i, j)).toSeq
        (rest, prob) <- segs(j)
      } yield (word.substring(i, j) +: rest, pp * prob)
    val all = segs(0)
    val z = all.map(_._2).sum
    val out = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    all.foreach { case (pieces, prob) =>
      pieces.foreach(s => out(s) += freq * prob / z)
    }
    out.toMap
  }

  test("forward-backward expected counts equal full segmentation enumeration") {
    val logp = Map("t" -> -2.0, "h" -> -2.2, "e" -> -1.9, "th" -> -1.5,
      "he" -> -1.7, "the" -> -1.0, "c" -> -2.5, "a" -> -2.0, "at" -> -1.4,
      "cat" -> -1.2)
    for ((w, f) <- Seq(("the", 10L), ("cat", 5L), ("thecat", 2L))) {
      val got = graft.ext.Unigram.expectedCounts(w, f, logp, 3).toMap
      val want = refExpected(w, f, logp, 3)
      assert(got.keySet == want.keySet, s"$w keys")
      want.foreach { case (s, v) =>
        assert(math.abs(got(s) - v) < 1e-9 * math.max(1.0, v.abs),
          s"$w piece $s: ${got(s)} vs $v")
      }
    }
  }

  test("EM ascends the corpus likelihood; training fits the budget") {
    val words = Bpe.wordFreqs(corpus, "text").localCheckpoint()
    val seed = Unigram.seedPieces(words, maxPieceLen = 4, seedSize = 120)
    val totalW = seed.map(_._2.toDouble).sum
    var logp = seed.map { case (s, w) =>
      s -> math.log(w / totalW)
    }.toMap
    def ll(lp: Map[String, Double]) = Unigram.corpusLogLikelihood(words,
      Unigram.Model(lp.toSeq.map { case (s, l) => Unigram.Piece(s, l) },
        math.log(1e-10)))
    var prev = ll(logp)
    for (i <- 0 until 3) {
      logp = Unigram.emStep(words, logp, maxLen = 4)
      val cur = ll(logp)
      assert(cur >= prev - 1e-9, s"EM step $i decreased likelihood: $prev -> $cur")
      prev = cur
    }
    val m = Unigram.train(corpus, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 120)
    assert(m.pieces.size <= 40)
    // every single character of the corpus survives pruning
    val chars = corpus.select(explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= "" && col("c") =!= " ")
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(m.pieces.map(_.piece).toSet))
  }

  test("trainLocal matches the distributed trainer (approximate: summation order)") {
    val dist = Unigram.train(corpus, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 120)
    val local = Unigram.trainLocal(corpus, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 120)
    // identical piece inventories (the prune decisions agree)…
    assert(local.pieces.map(_.piece).toSet == dist.pieces.map(_.piece).toSet,
      "piece sets diverged")
    // …and probabilities equal up to cross-partition double-sum order
    val dm = dist.logpOf
    local.pieces.foreach { p =>
      assert(math.abs(p.logp - dm(p.piece)) < 1e-6,
        s"logp diverged for '${p.piece}': ${p.logp} vs ${dm(p.piece)}")
    }
    // encode output is identical under both models
    val a = Unigram.encode(corpus, "doc_id", "text", dist)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = Unigram.encode(corpus, "doc_id", "text", local)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }

  test("trainLocal is O(1) Spark jobs regardless of EM iterations") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // many shrink rounds × EM iterations — distributed train would run
      // one job per emStep; the local path collects the word table once
      val m = Unigram.trainLocal(corpus, "text", vocabSize = 30,
        maxPieceLen = 4, seedSize = 200, emIters = 4)
      Thread.sleep(1500) // listener bus is async
      assert(m.pieces.nonEmpty)
      assert(jobs.get() <= 3,
        s"expected O(1) Spark jobs for a local train, got ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("Viterbi reconstructs every word; frequent substrings become pieces") {
    val m = Unigram.train(corpus, "text", vocabSize = 50,
      maxPieceLen = 4, seedSize = 120)
    val enc = Unigram.encode(corpus, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val rebuilt = {
        // tokens concatenate back to the words in order
        val words = t.split(" ").filter(_.nonEmpty)
        var toks = enc(id).toList
        words.map { w =>
          val sb = new StringBuilder
          while (sb.length < w.length) { sb ++= toks.head; toks = toks.tail }
          sb.toString
        }.mkString(" ")
      }
      assert(rebuilt == t.split(" ").filter(_.nonEmpty).mkString(" "),
        s"doc $id reconstruction")
    }
    // 'at' ('cat'/'rat'/'sat'/'mat'/'flat' family) must be a learned piece
    // with higher prob than a rare multigram
    assert(m.logpOf.contains("at"), "frequent substring 'at' pruned away")
    // unknown characters at encode time fall back to unk single chars
    val weird = Seq((9L, "zzq at")).toDF("doc_id", "text")
    val wtoks = Unigram.encode(weird, "doc_id", "text", m)
      .collect().head.getSeq[String](1)
    assert(wtoks.mkString == "zzqat")
  }

  test("sampled segmentation follows the exact path posterior") {
    // small closed model: enumerate all segmentations of "abc" and check
    // the empirical distribution over a FIXED deterministic draw sequence
    val m = Unigram.Model(Seq(
      Unigram.Piece("a", math.log(0.3)), Unigram.Piece("b", math.log(0.2)),
      Unigram.Piece("c", math.log(0.1)), Unigram.Piece("ab", math.log(0.25)),
      Unigram.Piece("bc", math.log(0.15)),
      Unigram.Piece("abc", math.log(0.05))), math.log(1e-10))
    val word = "abc"
    // theoretical path probs at alpha=1
    val paths = Map(
      Seq("a", "b", "c") -> 0.3 * 0.2 * 0.1,
      Seq("ab", "c") -> 0.25 * 0.1,
      Seq("a", "bc") -> 0.3 * 0.15,
      Seq("abc") -> 0.05)
    val z = paths.values.sum
    val n = 4000
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
      .withDefaultValue(0)
    def hl(v: Long, seed: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed)
    for (s <- 0 until n) {
      val seg = Unigram.sampleSegmentation(word, m, alpha = 1.0,
        pos => (hl(pos.toLong, s.toLong) >>> 11).toDouble /
          (1L << 53).toDouble)
      assert(seg.mkString == word)
      counts(seg) += 1
    }
    paths.foreach { case (p, prob) =>
      val want = prob / z
      val got = counts(p).toDouble / n
      assert(math.abs(got - want) < 0.03,
        s"path $p: sampled $got vs theoretical $want")
    }
    // alpha sharpening: the top-2 paths ("abc" 0.05 vs "a","bc" 0.045)
    // are close, so it takes alpha=40 for (.05/.045)^40 ~ 67:1 odds and
    // the Viterbi path to dominate the draw
    val hard = (0 until 500).map(s =>
      Unigram.sampleSegmentation(word, m, alpha = 40.0,
        pos => (hl(pos.toLong, s.toLong + 7777) >>> 11).toDouble /
          (1L << 53).toDouble))
    val viterbi = Unigram.viterbi(word, m)
    assert(hard.count(_ == viterbi) > 450)
  }

  test("encodeSampled: deterministic per salt, diverse across salts, valid") {
    val m = Unigram.train(corpus, "text", vocabSize = 50,
      maxPieceLen = 4, seedSize = 120)
    def run(salt: Long) = Unigram.encodeSampled(
        corpus.repartition(5), "doc_id", "text", m, alpha = 0.3, salt = salt)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val s0 = run(0L); val s0again = run(0L); val s1 = run(1L)
    assert(s0 == s0again, "same salt must reproduce bit-identically")
    assert(s0 != s1, "different salts must sample different segmentations")
    // all variants reconstruct the text's words
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, toks) <- s0 ++ s1) {
      assert(toks.mkString ==
        texts(id).split(" ").filter(_.nonEmpty).mkString)
    }
  }

  test("save/load round-trips the model; a loaded model encodes identically") {
    val m = Unigram.train(corpus, "text", vocabSize = 50,
      maxPieceLen = 4, seedSize = 120)
    val path = tmpDir("unigram-model")
    Unigram.save(m, path, spark)
    val m2 = Unigram.load(spark, path)
    assert(m2.pieces == m.pieces && m2.unkLogp == m.unkLogp)
    val a = Unigram.encode(corpus, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val b = Unigram.encode(corpus, "doc_id", "text", m2)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(a.toSeq == b.toSeq)
  }

  test("encode runs under Structured Streaming with batch-identical output") {
    val m = Unigram.train(corpus, "text", vocabSize = 50,
      maxPieceLen = 4, seedSize = 120)
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Unigram.encode(stream.toDS().toDF("doc_id", "text"),
        "doc_id", "text", m)
      .writeStream.format("memory").queryName("unigram_stream")
      .outputMode("append").start()
    corpus.collect().foreach(r =>
      stream.addData((r.getLong(0), r.getString(1))))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("unigram_stream")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val batch = Unigram.encode(corpus, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(streamed == batch)
  }

  test("encode is deterministic and distributed-shape (model broadcast)") {
    val m = Unigram.train(corpus, "text", vocabSize = 50,
      maxPieceLen = 4, seedSize = 120)
    val a = Unigram.encode(corpus.repartition(7), "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val b = Unigram.encode(corpus.repartition(2), "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(a.toSeq == b.toSeq)
  }
}
