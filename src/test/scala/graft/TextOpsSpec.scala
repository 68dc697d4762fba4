package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stats: hand-checked example") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextOps.stats(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_stop") == 2)          // "the", "a"
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-12)
    // chars = 20, word chars = 20 - 5 = 15, avg = 2.5
    assert(math.abs(r.getAs[Double]("avg_word_len") - 2.5) < 1e-12)
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"), (4L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L) != fp(4L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("token counts: whitespace vs regex vs estimator") {
    val df = Seq((1L, "ab cd12 ef!")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 3)
    // regex classes: [ab][cd][12][ef][!]
    assert(r.getAs[Long]("re_tokens") == 5)
    assert(r.getAs[Long]("est_tokens") == math.ceil(11 / 4.0).toLong)
  }

  test("langGuess probes marker stopwords") {
    val df = Seq(
      (1L, "the spark engine"), (2L, "le moteur spark"),
      (3L, "der spark motor"), (4L, "el motor spark"),
      (5L, "spark engine motor")
    ).toDF("doc_id", "text")
    val g = df.select(col("doc_id"), TextOps.langGuess(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "es", 5L -> "xx"))
  }

  test("boilerplate stats flag shingles shared across enough docs") {
    // the 4-word prefix "spark shuffles data fast" yields 2 shared 3-gram
    // shingles present in all 3 docs; each doc's tail shingles are unique
    val df = Seq(
      (1L, "spark shuffles data fast alpha beta gamma"),
      (2L, "spark shuffles data fast delta epsilon zeta"),
      (3L, "spark shuffles data fast eta theta iota")
    ).toDF("doc_id", "text")
    val r = TextOps.boilerplateStats(df, "doc_id", "text",
        shingleN = 3, minDf = 3L)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_shingles"), x.getAs[Long]("n_boiler")))).toMap
    // 7 words ⇒ 5 shingles/doc; 2 boilerplate (the shared prefix ones)
    assert(r == Map(1L -> ((5L, 2L)), 2L -> ((5L, 2L)), 3L -> ((5L, 2L))))
  }

  test("quality score components") {
    val good = Seq((1L, "the quick brown fox jumps over a lazy dog today"))
      .toDF("doc_id", "text")
    val tiny = Seq((2L, "hi there")).toDF("doc_id", "text")
    val q1 = TextOps.qualityScore(good, "doc_id", "text")
      .collect().head.getAs[Double]("quality")
    val q2 = TextOps.qualityScore(tiny, "doc_id", "text")
      .collect().head.getAs[Double]("quality")
    assert(q1 > q2)
    assert(math.abs(q1 - 1.0) < 1e-9)
  }
}
