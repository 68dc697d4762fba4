package graft

import org.apache.spark.sql.functions._

import graft.ext.Lm

/** Bigram LM (ext/Lm.scala): site expansion, model counts, smoothing,
  * OOV accounting, and the ln-based perplexity column that the DuckDB
  * oracle deliberately does not cover (libm ln is not guaranteed
  * bit-identical across engines — LmSpec is its correctness home).
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bigramSites expands adjacent pairs with positions, none for short docs") {
    val d = docs(1L -> "a b c a b", 2L -> "x", 3L -> "")
    val got = Lm.bigramSites(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 0L, "a", "b"), (1L, 1L, "b", "c"), (1L, 2L, "c", "a"),
      (1L, 3L, "a", "b")))
  }

  test("train: bigram counts, history counts, vocab") {
    val m = Lm.train(docs(1L -> "a b a b", 2L -> "b c"), "doc_id", "text")
    val c2 = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(c2 == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val c1 = m.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // c1 = bigram-HISTORY count (Σ_w2 c2), not raw occurrences: the final
    // "b" of doc 1 and the final "c" of doc 2 never start a bigram
    assert(c1 == Map("a" -> 2L, "b" -> 2L))
    assert(m.vocab.head().getLong(0) == 3L) // {a, b, c}
  }

  test("score: smoothed probabilities, OOV, and perplexity match a hand fold") {
    // model: a->b twice, b->a once; c1(a)=2, c1(b)=1; V = 2 ({a, b})
    val m = Lm.train(docs(1L -> "a b a b"), "doc_id", "text")
    // scored doc: bigrams (a,b) seen, (b,z) OOV (z also out-of-vocab)
    val r = Lm.score(docs(9L -> "a b z"), "doc_id", "text", m)
      .where(col("doc_id") === 9L).head()
    val pAB = (2.0 + 1.0) / (2.0 + 2.0) // (c2+1)/(c1+k·V)
    val pBZ = (0.0 + 1.0) / (1.0 + 2.0)
    assert(r.getAs[Long]("n_bigrams") == 2L)
    assert(r.getAs[Long]("n_oov") == 1L)
    assert(r.getAs[Double]("sum_condp") == 0.0 + pAB + pBZ)
    val avg = (math.log(pAB) + math.log(pBZ)) / 2.0
    assert(math.abs(r.getAs[Double]("avg_logp") - avg) < 1e-12)
    assert(math.abs(r.getAs[Double]("ppl") - math.exp(-avg)) < 1e-9)
  }

  test("a fluent doc scores better than word salad under the same model") {
    val corpus = (0L until 40L).map(i => i -> "the cat sat on the mat")
    val m = Lm.train(docs(corpus: _*), "doc_id", "text")
    val scored = Lm.score(
      docs(100L -> "the cat sat on the mat",
        101L -> "mat the on cat the sat"), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(scored(100L) < scored(101L),
      s"fluent ppl ${scored(100L)} should beat salad ppl ${scored(101L)}")
  }

  test("save/load roundtrip preserves counts, vocab and scores") {
    val m = Lm.train(docs(1L -> "a b a b", 2L -> "b c"), "doc_id", "text")
    val path = tmpDir("lm-model") + "/model"
    Lm.save(m, path)
    val m2 = Lm.load(spark, path)
    assert(m2.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      m.bigrams.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
    assert(m2.vocab.head().getLong(0) == 3L)
    val target = docs(9L -> "a b c")
    val s1 = Lm.score(target, "doc_id", "text", m).head()
    val s2 = Lm.score(target, "doc_id", "text", m2).head()
    assert(s1.getAs[Double]("sum_condp") == s2.getAs[Double]("sum_condp"))
  }

  test("fuzz: score matches a sequential reference bit-for-bit") {
    // same fold order (position-ordered, 0.0-seeded), same integer-ratio
    // probabilities — sum_condp must be EXACTLY equal, not approximately
    val rnd = new scala.util.Random(13)
    val vocabW = Vector("aa", "bb", "cc", "dd", "ee")
    for (iter <- 0 until 5) {
      val all = (0 until 8).map(i => (i.toLong,
        Seq.fill(2 + rnd.nextInt(7))(vocabW(rnd.nextInt(vocabW.size)))
          .mkString(" ")))
      val trainRows = all.filter(_._1 % 2 == 0)
      // reference model
      val bgs = trainRows.flatMap(d =>
        d._2.split(" ").sliding(2).filter(_.length == 2).map(g => (g(0), g(1))))
      val c2 = bgs.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      val c1 = bgs.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
      val v = trainRows.flatMap(_._2.split(" ")).distinct.size.toLong
      val expect = all.map { case (id, t) =>
        val sites = t.split(" ").sliding(2).filter(_.length == 2).toVector
        id -> sites.foldLeft(0.0) { (acc, g) =>
          acc + (c2.getOrElse((g(0), g(1)), 0L) + 1L).toDouble /
            (c1.getOrElse(g(0), 0L) + v).toDouble
        }
      }.filter { case (id, _) => all.find(_._1 == id).get._2.split(" ").length >= 2 }
        .toMap
      val m = Lm.train(trainRows.toDF("doc_id", "text"), "doc_id", "text")
      val got = Lm.score(all.toDF("doc_id", "text"), "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("sum_condp")).toMap
      assert(got == expect, s"iter $iter")
    }
  }

  test("Kneser–Ney: discount, interpolation and backoff match a hand fold") {
    // train: "a b a b a c" → c2: (a,b)=2 (b,a)=2 (a,c)=1; c1(a)=3 c1(b)=2
    // n1f(a)=2 n1f(b)=1; n1p(b)=1 n1p(a)=1 n1p(c)=1; T=3 types, V=3
    val m = Lm.trainKn(docs(1L -> "a b a b a c"), "doc_id", "text")
    val t = 3.0; val v = 3.0
    def pcont(n1p: Long) = (n1p + 1).toDouble / (t + v)
    // seen context, seen bigram (a,b): (2−.75)/3 + (.75·2/3)·pcont(b)
    // seen context, unseen bigram (a,a): 0/3 + (.75·2/3)·pcont(a)
    // unseen context (z,b): pure continuation pcont(b)
    val r = Lm.scoreKn(docs(9L -> "a b", 10L -> "a a", 11L -> "z b"),
      "doc_id", "text", m).collect()
      .map(x => x.getLong(0) ->
        (x.getAs[Long]("n_backoff"), x.getAs[Double]("sum_kn"))).toMap
    assert(r(9L) == ((0L,
      (2.0 - 0.75) / 3.0 + ((0.75 * 2.0) / 3.0) * pcont(1))))
    assert(r(10L) == ((0L,
      math.max(0.0 - 0.75, 0.0) / 3.0 + ((0.75 * 2.0) / 3.0) * pcont(1))))
    assert(r(11L) == ((1L, pcont(1))))
  }

  test("Kneser–Ney prefers versatile continuations (San-Francisco property)") {
    // "francisco" occurs 4× but ONLY ever after "san"; "table" occurs 4×
    // after 4 DISTINCT contexts. Raw-frequency smoothing treats them the
    // same; KN's continuation count must give the backoff path a higher
    // probability for "table" than for "francisco"
    val m = Lm.trainKn(docs(
      1L -> "san francisco san francisco san francisco san francisco",
      2L -> "red table blue table green table old table"),
      "doc_id", "text")
    val r = Lm.scoreKn(docs(9L -> "zz francisco", 10L -> "zz table"),
      "doc_id", "text", m).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("sum_kn")).toMap
    assert(r(10L) > r(9L),
      s"KN backoff should favor versatile 'table': ${r(10L)} !> ${r(9L)}")
  }

  test("fuzz: Kneser–Ney matches a sequential reference bit-for-bit") {
    val rnd = new scala.util.Random(29)
    val vocabW = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (iter <- 0 until 5) {
      val all = (0 until 10).map(i => (i.toLong,
        Seq.fill(2 + rnd.nextInt(8))(vocabW(rnd.nextInt(vocabW.size)))
          .mkString(" ")))
      val trainRows = all.filter(_._1 % 2 == 0)
      val bgs = trainRows.flatMap(d =>
        d._2.split(" ").sliding(2).filter(_.length == 2).map(g => (g(0), g(1))))
      val c2 = bgs.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      val c1 = bgs.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
      val n1f = c2.keys.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
      val n1p = c2.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
      val t = c2.size.toLong
      val v = trainRows.flatMap(_._2.split(" ")).distinct.size.toLong
      def pcont(w2: String) =
        (n1p.getOrElse(w2, 0L) + 1L).toDouble / (t + v).toDouble
      val expect = all.flatMap { case (id, txt) =>
        val sites = txt.split(" ").sliding(2).filter(_.length == 2).toVector
        if (sites.isEmpty) None
        else Some(id -> sites.foldLeft(0.0) { (acc, g) =>
          acc + (c1.get(g(0)) match {
            case None => pcont(g(1))
            case Some(cc1) =>
              math.max(c2.getOrElse((g(0), g(1)), 0L).toDouble - 0.75, 0.0) /
                cc1.toDouble +
                ((0.75 * n1f(g(0)).toDouble) / cc1.toDouble) * pcont(g(1))
          })
        })
      }.toMap
      val m = Lm.trainKn(trainRows.toDF("doc_id", "text"), "doc_id", "text")
      val got = Lm.scoreKn(all.toDF("doc_id", "text"), "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("sum_kn")).toMap
      assert(got == expect, s"iter $iter")
    }
  }

  test("held-out split in the declared queries produces real OOV") {
    val all = docs(1L -> "p q r", 2L -> "p q s", 10L -> "p q zz")
    val m = Lm.train(all.where(pmod(col("doc_id"), lit(10)) =!= 0),
      "doc_id", "text")
    val oov = Lm.score(all, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_oov")).toMap
    assert(oov(1L) == 0L && oov(2L) == 0L && oov(10L) == 1L)
  }
}
