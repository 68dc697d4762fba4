package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.CurationStream

/** The composed streaming curation ingest (quality screen → normalized-hash
  * exact dedup → banded near-dup screen vs the persisted index → idempotent
  * per-batch commit).
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  // ≥25 tokens, a stopword ratio over 2%, mostly-distinct words — passes
  // the quality screen; the `seed` words keep documents unrelated
  private def good(i: Int): String =
    s"the quick brown fox f$i jumps over a lazy dog near gate$i and " +
      s"then walks in small steps past alpha$i beta$i gamma$i delta$i " +
      s"epsilon$i zeta$i eta$i theta$i iota$i kappa$i finally resting"

  private def nearDup(s: String): String = s.replace("quick", "rapid")

  test("ingestBatch: quality, exact and near-dup screens compose; replay is idempotent") {
    val accepted = tmpDir("cur-acc") + "/corpus"
    val index = tmpDir("cur-idx") + "/index"

    // batch 0: two good docs, a too-short doc, an exact-normalized dup of 1
    val b0 = Seq(
      1L -> good(1),
      2L -> good(2),
      3L -> "tiny doc",
      4L -> (good(1).toUpperCase + " !!!")
    ).toDF("doc_id", "text")
    CurationStream.ingestBatch(b0, 0L, "doc_id", "text", accepted, index)
    def acceptedIds() = CurationStream.accepted(spark, accepted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedIds() == Set(1L, 2L))

    // batch 1: exact dup of 2 (vs corpus), near-dup of 1 (vs index), a
    // fresh good doc, and an in-batch near-dup pair (8 wins over 9)
    val b1 = Seq(
      5L -> good(2),
      6L -> nearDup(good(1)),
      7L -> good(7),
      8L -> good(8),
      9L -> nearDup(good(8))
    ).toDF("doc_id", "text")
    CurationStream.ingestBatch(b1, 1L, "doc_id", "text", accepted, index)
    assert(acceptedIds() == Set(1L, 2L, 7L, 8L))

    // replay of batch 1 (at-least-once foreachBatch) rewrites ingest=1
    // instead of duplicating it; the duplicate index rows it appends must
    // not change any verdict
    CurationStream.ingestBatch(b1, 1L, "doc_id", "text", accepted, index)
    assert(acceptedIds() == Set(1L, 2L, 7L, 8L))
    val rows = CurationStream.accepted(spark, accepted).collect()
    assert(rows.length == 4)

    // batch 2 after the replay: near-dup of 7 still caught, fresh doc lands
    val b2 = Seq(10L -> nearDup(good(7)), 11L -> good(11))
      .toDF("doc_id", "text")
    CurationStream.ingestBatch(b2, 2L, "doc_id", "text", accepted, index)
    assert(acceptedIds() == Set(1L, 2L, 7L, 8L, 11L))

    // provenance: the ingest partition column records the committing batch
    val byBatch = CurationStream.accepted(spark, accepted)
      .select("doc_id", "ingest").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byBatch == Map(1L -> 0, 2L -> 0, 7L -> 1, 8L -> 1, 11L -> 2))
  }

  test("fuzz: arbitrary batch splits keep the accepted corpus clean, unique and complete") {
    // ground truth: clean unique docs (all must survive), exact-dup groups
    // (exactly one survivor each), near-dup groups (exactly one each —
    // J ≈ 0.9, where 16-band MinHash recall is ~1 and the seeds are fixed,
    // so the outcome is deterministic), junk (none survive). The BATCH
    // SPLIT is random: the invariants must hold no matter how arrival
    // carves the corpus.
    val rnd = new scala.util.Random(31)
    for (iter <- 0 until 3) {
      val clean = (0 until 12).map(i => (100L + i, good(i)))
      val exactGroups = (0 until 3).map { g =>
        val base = good(50 + g)
        (0 until 2 + rnd.nextInt(2)).map(j =>
          (300L + 10 * g + j, if (j == 0) base else base.toUpperCase + " !"))
      }
      val nearGroups = (0 until 3).map { g =>
        val base = good(80 + g)
        Seq((500L + 10 * g, base), (500L + 10 * g + 1, nearDup(base)))
      }
      val junk = (0 until 4).map(i => (700L + i, s"junk $i"))
      val all = rnd.shuffle(
        clean ++ exactGroups.flatten ++ nearGroups.flatten ++ junk)

      // carve into 1..5 ordered batches
      val nBatches = 1 + rnd.nextInt(5)
      val batches = all.zipWithIndex
        .groupBy { case (_, ix) => ix % nBatches }
        .toSeq.sortBy(_._1).map(_._2.map(_._1))

      val accepted = tmpDir(s"cur-fz$iter") + "/corpus"
      val index = tmpDir(s"cur-fzi$iter") + "/index"
      batches.zipWithIndex.foreach { case (b, id) =>
        CurationStream.ingestBatch(b.toDF("doc_id", "text"), id.toLong,
          "doc_id", "text", accepted, index)
      }
      val ids = CurationStream.accepted(spark, accepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet

      clean.foreach { case (id, _) =>
        assert(ids.contains(id), s"iter $iter: clean doc $id dropped")
      }
      junk.foreach { case (id, _) =>
        assert(!ids.contains(id), s"iter $iter: junk $id accepted")
      }
      (exactGroups ++ nearGroups).foreach { group =>
        val got = group.map(_._1).count(ids.contains)
        assert(got == 1,
          s"iter $iter: group ${group.map(_._1)} kept $got, want exactly 1")
      }
    }
  }

  test("lm fluency gate drops word salad that passes the rule screen") {
    import graft.ext.Lm
    val accepted = tmpDir("cur-lma") + "/corpus"
    val index = tmpDir("cur-lmi") + "/index"
    val modelPath = tmpDir("cur-lmm") + "/model"
    // offline: train the bigram model on a fluent reference slice
    val ref = (0 until 30).map(i => i.toLong -> good(i))
      .toDF("doc_id", "text")
    Lm.save(Lm.train(ref, "doc_id", "text"), modelPath)
    val model = Lm.load(spark, modelPath)

    // the salad is a fluent doc REVERSED: same tokens, same stopword
    // ratio and distinctness (rule screen passes), near-zero shared
    // 3-gram shingles (near-dup screen passes) — but its bigrams are the
    // model's backwards, so the fluency score collapses
    val fluent = good(50)
    val salad = good(51).split(" ").reverse.mkString(" ")
    val scored = Lm.score(
        Seq(100L -> fluent, 101L -> salad).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(scored(100L) > scored(101L))
    val floor = (scored(100L) + scored(101L)) / 2.0

    CurationStream.ingestBatch(
      Seq(100L -> fluent, 101L -> salad).toDF("doc_id", "text"),
      0L, "doc_id", "text", accepted, index,
      lmModel = Some(model), minAvgLogp = floor)
    val got = CurationStream.accepted(spark, accepted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(100L),
      s"fluent doc kept, salad dropped; got $got")
  }

  test("streaming end-to-end: micro-batches dedup against everything accepted before them") {
    implicit val sql = spark.sqlContext
    val accepted = tmpDir("cur-acc2") + "/corpus"
    val index = tmpDir("cur-idx2") + "/index"
    val ckpt = tmpDir("cur-ckpt2")

    val in = MemoryStream[(Long, String)]
    val q = CurationStream.start(in.toDF.toDF("doc_id", "text"),
      "doc_id", "text", accepted, index, ckpt)
    in.addData(Seq(1L -> good(1), 2L -> good(2), 3L -> "tiny doc"))
    q.processAllAvailable()
    in.addData(Seq(4L -> nearDup(good(1)), 5L -> good(5)))
    q.processAllAvailable()
    q.stop()

    val ids = CurationStream.accepted(spark, accepted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 5L))
  }
}
