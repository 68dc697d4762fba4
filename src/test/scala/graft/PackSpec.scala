package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Best-fit-decreasing packing verification: capacity and offset
  * invariants, a hand-traced golden assignment, determinism across input
  * partitionings, and the packing-quality relation to the contiguous
  * packer (no split docs, pack count near the volume lower bound).
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)], budget: Long) =
    TextOps.packBestFit(
      rows.toDF("doc_id", "n_tokens", "shard"),
      "doc_id", "n_tokens", "shard", budget)

  test("golden BFD trace: longest-first, best fit, new pack on no-fit") {
    // budget 10, lengths 6,5,4,4,3,3,3,2 (ids follow desc length so the
    // sort is unambiguous):
    //   6→p0(rem 4); 5→p1(rem 5); 4→p0 best-fit(rem 0); 4→p1(rem 1);
    //   3→no fit→p2(rem 7); 3→p2(rem 4); 3→p2(rem 1); 2→no fit→p3
    val rows = Seq[(Long, Long, String)](
      (1L, 6L, "a"), (2L, 5L, "a"), (3L, 4L, "a"), (4L, 4L, "a"),
      (5L, 3L, "a"), (6L, 3L, "a"), (7L, 3L, "a"), (8L, 2L, "a"))
    val got = run(rows, 10L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"))).toMap
    assert(got == Map(
      1L -> (0L, 0L), 2L -> (1L, 0L), 3L -> (0L, 6L), 4L -> (1L, 5L),
      5L -> (2L, 0L), 6L -> (2L, 3L), 7L -> (2L, 6L), 8L -> (3L, 0L)))
  }

  test("capacity, offset, and position invariants hold on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i.toLong, (1 + rnd.nextInt(300)).toLong, s"s${i % 5}")
    }
    val budget = 256L
    val got = run(rows, budget).collect()
    assert(got.length == rows.length)
    val byPack = got.groupBy(r =>
      (r.getAs[String]("shard"), r.getAs[Long]("pack_id")))
    val lens = rows.map { case (id, nt, _) => id -> nt }.toMap
    byPack.foreach { case ((sh, p), docs) =>
      val total = docs.map(r => lens(r.getAs[Long]("doc_id"))).sum
      val over = docs.exists(_.getAs[Long]("oversize") == 1L)
      assert(over || total <= budget, s"pack ($sh,$p) overflows: $total")
      if (over) assert(docs.length == 1, "oversize docs pack alone")
      // offsets are the prefix sums of the placement order
      val inOrder = docs.sortBy(_.getAs[Long]("pack_pos"))
      var acc = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("pack_offset") == acc,
          s"pack ($sh,$p) pos ${r.getAs[Long]("pack_pos")}")
        acc += lens(r.getAs[Long]("doc_id"))
      }
    }
    // no split docs by construction; pack count near the volume bound
    val nPacks = byPack.keys.size
    val lower = rows.groupBy(_._3).map { case (_, rs) =>
      (rs.map(_._2).sum + budget - 1) / budget
    }.sum
    assert(nPacks <= lower * 3 / 2 + 5, s"$nPacks packs vs lower bound $lower")
  }

  test("assignment is invariant to input partitioning") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      (i.toLong, (1 + rnd.nextInt(120)).toLong, s"s${i % 3}")
    }
    def asMap(parts: Int) = TextOps.packBestFit(
        rows.toDF("doc_id", "n_tokens", "shard").repartition(parts),
        "doc_id", "n_tokens", "shard", 128L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("pack_pos"),
          r.getAs[Long]("pack_offset"))).toMap
    assert(asMap(1) == asMap(11))
  }

  test("oversize docs are flagged and never share a pack") {
    val rows = Seq[(Long, Long, String)](
      (1L, 50L, "a"), (2L, 10L, "a"), (3L, 70L, "a"), (4L, 5L, "a"))
    val got = run(rows, 32L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("oversize"))).toMap
    assert(got(1L)._2 == 1L && got(3L)._2 == 1L)
    assert(got(2L)._2 == 0L && got(4L)._2 == 0L)
    val oversizePacks = Set(got(1L)._1, got(3L)._1)
    assert(oversizePacks.size == 2)
    assert(!oversizePacks.contains(got(2L)._1))
    assert(got(2L)._1 == got(4L)._1, "the two small docs best-fit together")
  }
}
