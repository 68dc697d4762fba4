package graft

import org.apache.spark.sql.functions._

import graft.ext.Dsir

/** DSIR verification: weights against a sequential reference (same hashed
  * buckets, same add-1 smoothing, plain Double arithmetic), the
  * domain-shift property (docs from the target domain weigh higher than
  * off-domain docs), and Gumbel-top-k selection determinism/shape.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two synthetic "domains" with disjoint-ish vocabularies
  private val legal = Seq(
    "whereas the party of the first part shall indemnify the aforesaid party",
    "the contract herein shall be governed by the laws of the state",
    "notwithstanding any provision herein the parties agree to arbitrate",
    "the aforesaid covenant shall survive termination of this agreement")
  private val chat = Seq(
    "lol that movie was so great you have to watch it tonight",
    "omg did you see the game last night that was wild",
    "haha yeah i totally forgot to bring the snacks again",
    "see you at the park later bring your dog too")

  private def corpus = (legal ++ chat).zipWithIndex
    .map { case (t, i) => (i.toLong, t, if (i < legal.size) "legal" else "chat") }
    .toDF("doc_id", "text", "domain")

  private val B = 64

  /** Sequential reference of the per-doc log weight. */
  private def refWeights(target: Seq[String], raw: Seq[String],
      docs: Seq[(Long, String)]): Map[Long, Double] = {
    // xxhash64 must match Spark's — compute bucket ids VIA Spark (one small
    // local DataFrame), then do the model arithmetic sequentially
    val allTexts = (target ++ raw ++ docs.map(_._2)).distinct
    val bigrams = allTexts.flatMap(t => t.split(" ").sliding(2)
      .filter(_.length == 2).map(_.mkString(" "))).distinct
    val bmap = bigrams.toDF("bg")
      .select(col("bg"), pmod(xxhash64(col("bg")), lit(B.toLong)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def sites(t: String): Seq[Long] = t.split(" ").sliding(2)
      .filter(_.length == 2).map(p => bmap(p.mkString(" "))).toSeq
    def dist(texts: Seq[String]): Map[Long, Double] = {
      val ss = texts.flatMap(sites)
      val n = ss.size.toDouble
      val cnt = ss.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      (0L until B.toLong).map(b =>
        b -> math.log((cnt.getOrElse(b, 0.0) + 1.0) / (n + B))).toMap
    }
    val pt = dist(target); val pr = dist(raw)
    docs.map { case (id, t) =>
      id -> sites(t).map(b => pt(b) - pr(b)).sum
    }.toMap
  }

  test("log weights match the sequential reference") {
    val docs = corpus
    val m = Dsir.fit(docs.where(col("domain") === "legal"), docs,
      "doc_id", "text", buckets = B)
    val got = Dsir.logWeights(docs, "doc_id", "text", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_w"))
      .toMap
    val ref = refWeights(legal, legal ++ chat,
      (legal ++ chat).zipWithIndex.map { case (t, i) => (i.toLong, t) })
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - ref(id)) < 1e-9, s"doc $id: $w vs ${ref(id)}")
    }
  }

  test("target-domain docs weigh higher than off-domain docs") {
    val docs = corpus
    val m = Dsir.fit(docs.where(col("domain") === "legal"), docs,
      "doc_id", "text", buckets = B)
    val w = Dsir.logWeights(docs, "doc_id", "text", m)
      .join(docs.select("doc_id", "domain"), "doc_id")
      .groupBy("domain").agg(avg("log_w").as("mw"))
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Double]("mw"))
      .toMap
    assert(w("legal") > w("chat") + 1.0,
      s"legal ${w("legal")} should clearly exceed chat ${w("chat")}")
  }

  test("weights are invariant to input partitioning") {
    val docs = corpus
    val m = Dsir.fit(docs.where(col("domain") === "legal"), docs,
      "doc_id", "text", buckets = B)
    val w1 = Dsir.logWeights(docs.repartition(1), "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("log_w"))).toMap
    val w7 = Dsir.logWeights(docs.repartition(7), "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("log_w"))).toMap
    assert(w1 == w7)
  }

  test("gumbel-top-k selection is deterministic and weight-responsive") {
    val docs = corpus
    val sel1 = Dsir.select(docs.where(col("domain") === "legal"), docs,
      "doc_id", "text", k = 4, buckets = B, salt = "s1")
      .select("doc_id").as[Long].collect().toSet
    val sel2 = Dsir.select(docs.where(col("domain") === "legal"), docs,
      "doc_id", "text", k = 4, buckets = B, salt = "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(sel1 == sel2, "same salt must select the same set")
    // weights here are sharply separated (legal docs score their own
    // domain), so the 4-doc draw should be mostly legal docs
    val legalIds = (0 until legal.size).map(_.toLong).toSet
    assert((sel1 & legalIds).size >= 3,
      s"selection $sel1 should be dominated by the target domain")
  }

  test("resample draws k docs and keeps the weight columns") {
    val w = Seq((1L, 5L, 0.0), (2L, 5L, 10.0), (3L, 5L, -10.0))
      .toDF("doc_id", "n_feats", "log_w")
    val r = Dsir.resample(w, "doc_id", k = 2, salt = "x")
    assert(r.count() == 2)
    assert(r.columns.toSet ==
      Set("doc_id", "n_feats", "log_w", "gumbel_key"))
    // a +10-vs-−10 log-weight gap (odds e^20) must win over Gumbel noise
    val ids = r.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(2L) && !ids.contains(3L))
  }
}
