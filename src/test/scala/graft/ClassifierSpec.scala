package graft

import org.apache.spark.sql.functions._

import graft.ext.Classifier

/** Distilled quality classifier: the distributed GD fit must agree with a
  * sequential reference implementation (same features, same labels, same
  * iteration schedule) up to float-sum reassociation, and the distilled
  * scores must substantially reproduce the teaching rules' verdicts.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus straddling every rule boundary: fluent keeps,
  // too-short drops, stopword-free drops, and word-salad repetition drops
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val common = Seq("the", "a", "of", "and", "in", "table", "scan", "join",
      "query", "row", "data", "key", "value", "sort", "merge", "batch")
    (0L until 60L).map { i =>
      val text = (i % 4) match {
        case 0 => // fluent: common words incl. stopwords, low repetition
          Seq.fill(30 + rnd.nextInt(40))(
            common(rnd.nextInt(common.length))).mkString(" ")
        case 1 => // too short
          Seq.fill(5 + rnd.nextInt(10))(
            common(rnd.nextInt(common.length))).mkString(" ")
        case 2 => // no stopwords
          Seq.fill(40)(common(5 + rnd.nextInt(common.length - 5)) +
            rnd.nextInt(1000)).mkString(" ")
        case _ => // repetitive word salad
          Seq.fill(50)(common(5 + rnd.nextInt(3))).mkString(" ")
      }
      (i, text)
    }
  }

  // the sequential twin of Classifier.features + Classifier.train
  private def seqFeatures(text: String): (Double, Array[Double]) = {
    val ws = text.split(" ", -1)
    val nTok = ws.length.toDouble
    val stop = Set("the", "a", "of", "and", "in")
    val stopRatio = ws.count(stop.contains).toDouble / nTok
    val dupRatio = (nTok - ws.distinct.length) / nTok
    val keep = !(nTok < 25 || stopRatio < 0.02 || dupRatio > 0.65)
    val meanLen = (text.length - nTok + 1) / nTok
    (if (keep) 1.0 else 0.0,
      Array(nTok / 100.0, stopRatio, dupRatio, meanLen))
  }

  // the sequential twin of Classifier.train: ridge-Newton / IRLS with the
  // same λ placement (no shrink on the intercept) and a plain 5×5 solve
  private def seqTrain(rows: Seq[(Double, Array[Double])], iters: Int,
      lambda: Double = 1e-3): Array[Double] = {
    val w = Array.fill(5)(0.0)
    def xj(x: Array[Double], j: Int) = if (j == 0) 1.0 else x(j - 1)
    for (_ <- 0 until iters) {
      val g = Array.fill(5)(0.0)
      val h = Array.ofDim[Double](5, 5)
      rows.foreach { case (y, x) =>
        val margin = w(0) + (0 until 4).map(j => w(j + 1) * x(j)).sum
        val p = 1.0 / (1.0 + math.exp(-margin))
        val s = p * (1.0 - p)
        for (i <- 0 until 5) {
          g(i) += (y - p) * xj(x, i)
          for (j <- 0 until 5) h(i)(j) += s * xj(x, i) * xj(x, j)
        }
      }
      for (j <- 1 until 5) { g(j) -= lambda * w(j); h(j)(j) += lambda }
      // Gaussian elimination with partial pivoting
      val a = h.map(_.clone()); val b = g.clone()
      for (c <- 0 until 5) {
        val piv = (c until 5).maxBy(r => math.abs(a(r)(c)))
        val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = b(c); b(c) = b(piv); b(piv) = tb
        for (r <- c + 1 until 5) {
          val f = a(r)(c) / a(c)(c)
          for (cc <- c until 5) a(r)(cc) -= f * a(c)(cc)
          b(r) -= f * b(c)
        }
      }
      val step = new Array[Double](5)
      for (c <- 4 to 0 by -1) {
        var acc = b(c)
        for (cc <- c + 1 until 5) acc -= a(c)(cc) * step(cc)
        step(c) = acc / a(c)(c)
      }
      for (j <- 0 until 5) w(j) += step(j)
    }
    w
  }

  test("distributed ridge-Newton matches the sequential reference") {
    val df = corpus.toDF("doc_id", "text")
    val feats = Classifier.features(df, "doc_id", "text").localCheckpoint()
    val m = Classifier.train(feats, iters = 8)
    val ref = seqTrain(corpus.map(c => seqFeatures(c._2)), 8)
    m.weights.zip(ref).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"weights diverged: ${m.weights.toSeq} vs ${ref.toSeq}")
    }
  }

  test("features reproduce the rule screen's signals exactly") {
    val df = corpus.toDF("doc_id", "text")
    val got = Classifier.features(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    corpus.zip(got).foreach { case ((_, text), row) =>
      val (y, x) = seqFeatures(text)
      assert(row.getDouble(1) == y, s"label mismatch for: $text")
      (0 until 4).foreach(j => assert(row.getDouble(2 + j) == x(j)))
    }
  }

  test("distilled scores substantially reproduce the rule verdicts") {
    val df = corpus.toDF("doc_id", "text")
    val feats = Classifier.features(df, "doc_id", "text").localCheckpoint()
    val m = Classifier.train(feats)
    val scored = Classifier.score(feats, m, "doc_id")
    val agree = scored.where(col("agree")).count().toDouble /
      scored.count()
    assert(agree >= 0.85, s"distillation agreement only $agree")
    // the continuous score orders quality sensibly: the mean score of
    // rule-kept docs clears the mean score of rule-dropped docs
    val mk = scored.where(col("rule_keep"))
      .agg(avg("score")).collect()(0).getDouble(0)
    val md = scored.where(!col("rule_keep"))
      .agg(avg("score")).collect()(0).getDouble(0)
    assert(mk > md, s"kept-doc mean score $mk !> dropped-doc mean $md")
  }

  test("empty corpus refuses to train") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val feats = Classifier.features(df, "doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.train(feats, iters = 1)
    }
  }
}
