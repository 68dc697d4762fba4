package graft

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.model.BlockHeader
import graft.reorg.Reconciler
import graft.stream.EventStream
import graft.stream.EventStream.{Backlog, HeadObservation, HeaderAction}

/** Port of the reference's table-driven reconcile suite
  * (`tracker_test.go:484-758`, 7 named cases) against the stateful
  * reconciler, plus set-level Reconciler checks and a randomized fuzz with
  * a canonical-chain oracle (`tracker_test.go:369-482`).
  */
class ReorgSpec extends SparkSpec {

  private def run(
      backlog: List[BlockHeader],
      obs: Seq[HeadObservation],
      maxBacklog: Int = 10
  ): (Seq[HeaderAction], List[BlockHeader]) = {
    val state = TestGroupState.create[Backlog](
      org.apache.spark.api.java.Optional.of(Backlog(backlog)),
      GroupStateTimeout.NoTimeout, 1L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out = EventStream.reconcileHead(maxBacklog)("f", obs.iterator, state)
      .toSeq
    (out, state.get.headers)
  }

  private def h(num: Long, tag: String = null, parent: String = null) = {
    val t = Option(tag).getOrElse(num.toString)
    val p = Option(parent).getOrElse((num - 1).toString)
    BlockHeader(num, s"h$t", s"h$p")
  }
  private def obs(b: BlockHeader) =
    HeadObservation("f", b.number, b.hash, b.parentHash)

  // ── the 7 golden cases ──────────────────────────────────────────────────

  test("empty history: first head is added") {
    val (out, backlog) = run(Nil, Seq(obs(h(1))))
    assert(out == Seq(HeaderAction("f", "add", 1, "h1")))
    assert(backlog == List(h(1)))
  }

  test("repeated header: no event, no state change") {
    val (out, backlog) = run(List(h(1)), Seq(obs(h(1))))
    assert(out.isEmpty)
    assert(backlog == List(h(1)))
  }

  test("new head: single add") {
    val (out, backlog) = run(List(h(1)), Seq(obs(h(2))))
    assert(out == Seq(HeaderAction("f", "add", 2, "h2")))
    assert(backlog == List(h(1), h(2)))
  }

  test("ignore block already on history") {
    val (out, backlog) = run(List(h(1), h(2), h(3)), Seq(obs(h(2))))
    assert(out.isEmpty)
    assert(backlog == List(h(1), h(2), h(3)))
  }

  test("multi roll back: dels oldest-first then add") {
    // history 1..4; new 30 at height 3 with parent 2 ⇒ del 3, del 4, add 30
    val (out, backlog) = run(
      List(h(1), h(2), h(3), h(4)),
      Seq(obs(h(3, tag = "30", parent = "2"))))
    assert(out == Seq(
      HeaderAction("f", "del", 3, "h3"),
      HeaderAction("f", "del", 4, "h4"),
      HeaderAction("f", "add", 3, "h30")))
    assert(backlog == List(h(1), h(2), h(3, tag = "30", parent = "2")))
  }

  test("backfills missing blocks") {
    // history 1,2; head jumps to 5 — the source supplies the full added
    // range 3,4,5 in the micro-batch (T6)
    val (out, backlog) = run(
      List(h(1), h(2)), Seq(obs(h(3)), obs(h(4)), obs(h(5))))
    assert(out == Seq(
      HeaderAction("f", "add", 3, "h3"),
      HeaderAction("f", "add", 4, "h4"),
      HeaderAction("f", "add", 5, "h5")))
    assert(backlog == List(h(1), h(2), h(3), h(4), h(5)))
  }

  test("rolls back and backfills") {
    // history 1..4; fork at height 3 (30←2), then 40, 50 on the new lineage
    val b30 = h(3, tag = "30", parent = "2")
    val b40 = h(4, tag = "40", parent = "30")
    val b50 = h(5, tag = "50", parent = "40")
    val (out, backlog) = run(
      List(h(1), h(2), h(3), h(4)), Seq(obs(b30), obs(b40), obs(b50)))
    assert(out == Seq(
      HeaderAction("f", "del", 3, "h3"),
      HeaderAction("f", "del", 4, "h4"),
      HeaderAction("f", "add", 3, "h30"),
      HeaderAction("f", "add", 4, "h40"),
      HeaderAction("f", "add", 5, "h50")))
    assert(backlog == List(h(1), h(2), b30, b40, b50))
  }

  test("head contradicting its direct parent retracts the stale parent") {
    // backlog ..4,5(h5); new head 6 with parent h5' ⇒ h5 is stale too
    val (out, backlog) = run(
      List(h(4), h(5)),
      Seq(obs(h(6, tag = "6F", parent = "5F"))))
    assert(out == Seq(
      HeaderAction("f", "del", 5, "h5"),
      HeaderAction("f", "add", 6, "h6F")))
    assert(backlog == List(h(4), h(6, tag = "6F", parent = "5F")))
  }

  test("backlog is bounded by maxBacklog") {
    val (_, backlog) = run(
      (1L to 10L).map(i => h(i)).toList, Seq(obs(h(11))), maxBacklog = 10)
    assert(backlog.size == 10)
    assert(backlog.head == h(2) && backlog.last == h(11))
  }

  // ── set-level Reconciler (J1) ──────────────────────────────────────────

  test("findAncestor: set-join form matches the pointer walk") {
    import spark.implicits._
    val stored = Seq((1L, "h1"), (2L, "h2"), (3L, "h3"), (4L, "h4"))
      .toDF("number", "hash")
    val live = Seq((1L, "h1"), (2L, "h2"), (3L, "h30"), (4L, "h40"))
      .toDF("number", "hash")
    assert(Reconciler.findAncestor(stored, live) == 2L)
  }

  test("reconcile errors when divergence exceeds the backlog") {
    val stored = (5L to 14L).map(i => h(i, tag = s"${i}X", parent = s"${i - 1}X"))
    val live = (5L to 14L).map(i => h(i))
    intercept[IllegalStateException] {
      Reconciler.reconcile(stored, live, maxBacklog = 10)
    }
  }

  // ── randomized fuzz with canonical-chain oracle ────────────────────────

  test("fuzz: random forks within backlog always converge to the oracle") {
    val rnd = new scala.util.Random(42)
    val maxBacklog = 10
    (1 to 25).foreach { _ =>
      var canonical = List(h(1))
      var state = List(h(1))
      var acc: (Seq[HeaderAction], List[BlockHeader]) = (Nil, state)
      var gen = 0
      (1 to 40).foreach { _ =>
        gen += 1
        val forkDepth = rnd.nextInt(math.min(maxBacklog - 1,
          canonical.size)) // 0 = pure advance
        val keep = canonical.dropRight(forkDepth)
        val base = keep.last
        val extend = 1 + rnd.nextInt(3)
        val fresh = (1 to forkDepth + extend).map { i =>
          val num = base.number + i
          val tag = s"$num-g$gen"
          val pTag = if (i == 1) base.hash.drop(1) else s"${num - 1}-g$gen"
          h(num, tag = tag, parent = pTag)
        }
        canonical = keep ++ fresh
        val o = fresh.map(obs)
        acc = run(acc._2, o, maxBacklog)
      }
      // oracle: the state backlog must equal the canonical tail
      assert(acc._2 == canonical.takeRight(maxBacklog))
    }
  }
}
