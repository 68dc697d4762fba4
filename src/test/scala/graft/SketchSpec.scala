package graft

import org.apache.spark.sql.functions._

import graft.ext.Sketch

/** Misra–Gries heavy-hitter verification: the survival guarantee (every
  * item with count > n/(k+1) is in the candidate set), end-to-end equality
  * with the plain GROUP BY/HAVING answer, and invariance to how the input
  * is partitioned (mergeability — the property that makes the per-partition
  * summaries sound at any cluster size).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed synthetic stream: item "h<i>" appears heavily, plus a long tail
    * of near-distinct noise items. Deterministic.
    */
  private def stream(nHeavy: Int, heavyCnt: Int, nNoise: Int): Seq[String] = {
    val heavy = (0 until nHeavy).flatMap(i => Seq.fill(heavyCnt)(s"h$i"))
    val noise = (0 until nNoise).map(i => s"noise${i % (nNoise / 2 + 1)}")
    // interleave deterministically so heavy items are spread, not clumped
    val mixed = (heavy ++ noise).zipWithIndex
      .sortBy { case (w, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)
    mixed
  }

  private def exactHeavy(items: Seq[String], denom: Long): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * denom >= n }.toMap
  }

  test("MG candidates are a superset of every item above n/(k+1)") {
    val items = stream(nHeavy = 5, heavyCnt = 200, nNoise = 3000)
    val n = items.size.toLong
    val k = 50
    for (parts <- Seq(1, 3, 8)) {
      val cand = Sketch
        .mgCandidates(items.toDS().repartition(parts), k)
        .as[String].collect().toSet
      val mustSurvive = items.groupBy(identity)
        .collect { case (w, os) if os.size.toLong > n / (k + 1) => w }
      assert(mustSurvive.nonEmpty, "test stream must have heavy items")
      mustSurvive.foreach(w => assert(cand.contains(w),
        s"guaranteed item $w missing from candidates at $parts partitions"))
    }
  }

  test("heavyHitters equals the exact GROUP BY/HAVING answer under any partitioning") {
    val items = stream(nHeavy = 4, heavyCnt = 150, nNoise = 2000)
    val denom = 20L
    val expected = exactHeavy(items, denom)
    assert(expected.nonEmpty)
    for (parts <- Seq(1, 5, 16)) {
      val got = Sketch
        .heavyHitters(items.toDS().repartition(parts), k = 25, denom = denom)
        .collect()
        .map(r => r.getAs[String]("item") -> r.getAs[Long]("cnt")).toMap
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("no heavy hitters => empty result, matching exact") {
    val items = (0 until 500).map(i => s"u$i") // all distinct
    val got = Sketch.heavyHitters(items.toDS(), k = 10, denom = 10L)
    assert(got.count() == 0L)
  }

  test("share is the exact count ratio") {
    val items = Seq.fill(30)("a") ++ (0 until 70).map(i => s"x$i")
    val r = Sketch.heavyHitters(items.toDS(), k = 10, denom = 5L)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("item") == "a")
    assert(r.head.getAs[Long]("cnt") == 30L)
    assert(r.head.getAs[Double]("share") == 30.0 / 100.0)
  }

  test("guarantee precondition is enforced") {
    intercept[IllegalArgumentException] {
      Sketch.heavyHitters(Seq("a").toDS(), k = 10, denom = 11L)
    }
  }
}
