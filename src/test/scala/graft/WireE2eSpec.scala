package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.FilterConfig
import graft.stream.{CurationStream, EventStream}
import graft.stream.EventStream.HeadObservation
import graft.sync.{HttpRpcProvider, Syncer}

/** The whole wire-to-store-to-curation lifecycle in ONE fuzzed case —
  * every integration seam that is spec'd separately (HttpSyncSpec wire
  * calls, IntegrationSpec streaming CDC, StreamCurationSpec ingest),
  * composed end-to-end:
  *
  *   loopback HTTP JSON-RPC server → batch backfill over the wire →
  *   streaming tail (reorgTail + foreachBatch CDC) → a seeded-random
  *   fork delivered MID-micro-batch (advance and reorg in one batch) →
  *   retraction → final store ≡ the canonical-chain oracle → the stored
  *   corpus ingested through CurationStream with an idempotent replay.
  */
class WireE2eSpec extends SparkSpec {
  import spark.implicits._

  test("wire → store → mid-batch reorg → retraction → curation (fuzzed end-to-end)") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(97)
    for (round <- 0 until 2) {
      val perBlock: Long => Int = n => if (n % 2 == 0) 2 else 1
      val chainA = MockChain.linear(24, perBlock)
      val srv = new StubEthServer(chainA)
      try {
        val p = new HttpRpcProvider(spark, srv.endpoint)
        val root = tmpDir(s"wire-e2e-$round")
        val filter = FilterConfig()

        // 1. batch backfill over real HTTP
        val syncer = new Syncer(spark, p, root, filter,
          batchSize = 7L, maxBlockBacklog = 8)
        syncer.sync()
        assert(syncer.table.read.count() ==
          (0L until 24L).map(perBlock(_).toLong).sum)

        // 2. the chain grows, then forks at a seeded-random depth
        val grown = chainA ++ (24 until 28).map(n =>
          MBlock(n, s"$n", s"${n - 1}", perBlock(n)))
        val depth = 1 + rnd.nextInt(3)
        val extend = 1 + rnd.nextInt(3)
        val forked = MockChain.fork(grown, depth, extend)

        // live log source for the CDC sink: every added block's logs are
        // fetched BY HASH over the wire (two phases — the stub serves one
        // lineage at a time, exactly like a node that pruned the loser)
        srv.chain = grown
        val grownTail = grown.drop(24).map(b =>
          p.getLogsByHash(b.hash, filter)).reduce(_ unionByName _)
        srv.chain = forked
        val forkTail = forked.filterNot(grown.contains).map(b =>
          p.getLogsByHash(b.hash, filter)).reduce(_ unionByName _)
        val liveLogs = grownTail.unionByName(forkTail)

        // 3. streaming tail; the fork lands MID-micro-batch: the last
        // old-lineage advance and the whole new lineage arrive in ONE batch
        val heads = MemoryStream[HeadObservation]
        val q = EventStream.reorgTail(heads.toDS(), maxBacklog = 10)
          .writeStream
          .foreachBatch(EventStream.applyCdc(syncer.table, liveLogs) _)
          .start()
        // explicit seq: the groupByKey shuffle scrambles within-batch row
        // order, and reconcileHead re-establishes ARRIVAL order from it —
        // without seq, the stale old-lineage head (number 27) can sort
        // after the replacement lineage and punch a hole in the backlog
        var seqNo = 0L
        def obs(b: MBlock) = {
          seqNo += 1
          HeadObservation("f", b.num, b.hash, b.parentHash, seq = seqNo)
        }
        heads.addData(obs(chainA.last))
        q.processAllAvailable()
        heads.addData(obs(grown(24)), obs(grown(25)), obs(grown(26)))
        q.processAllAvailable()
        val forkedTail = forked.filterNot(grown.contains)
        heads.addData((Seq(obs(grown(27))) ++ forkedTail.map(obs)): _*)
        q.processAllAvailable()
        q.stop()

        // 4. oracle: the store converged to the canonical (forked) chain,
        // with dense indices after the retraction
        val stored = syncer.table.read
        val storedTx = stored.select("tx_hash").as[String].collect().sorted
        val canonical = new MockProvider(spark, forked).allLogs
          .select("tx_hash").as[String].collect().sorted
        assert(storedTx.sameElements(canonical),
          s"round $round (depth=$depth extend=$extend): store != canonical; " +
            s"extra=${storedTx.diff(canonical).mkString(",")} " +
            s"missing=${canonical.diff(storedTx).mkString(",")}")
        val idx = stored.select("indx").as[Long].collect().sorted
        assert(idx.sameElements(idx.indices.map(_.toLong)))

        // 5. the stored logs feed the curation stream as documents; all
        // are unique quality-passing texts except one planted exact dup —
        // accepted = all minus the dup, and a full replay adds nothing
        // per-doc SALTED words (the StreamCurationSpec good() shape): docs
        // sharing only the static skeleton sit well below the J=0.5
        // near-dup bar; a single varying token would make every pair a
        // near-dup and the screen would (correctly) collapse the corpus
        val h = col("tx_hash")
        val docs = stored
          .select(col("indx").as("doc_id"),
            concat(
              lit("the quick brown fox f"), h, lit(" jumps over a lazy "),
              lit("dog near gate"), h, lit(" and then walks in small "),
              lit("steps past alpha"), h, lit(" beta"), h, lit(" gamma"), h,
              lit(" delta"), h, lit(" epsilon"), h, lit(" zeta"), h,
              lit(" eta"), h, lit(" theta"), h, lit(" iota"), h,
              lit(" kappa"), h, lit(" finally resting")).as("text"))
        val planted = docs.limit(1)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        val all = docs.unionByName(planted)
        val accepted = tmpDir(s"wire-cur-$round") + "/corpus"
        val index = tmpDir(s"wire-curi-$round") + "/index"
        CurationStream.ingestBatch(all, 0L, "doc_id", "text", accepted, index)
        val got = CurationStream.accepted(spark, accepted)
        assert(got.count() == docs.count(),
          s"round $round: exact dup must collapse, everything else accepted")
        CurationStream.ingestBatch(all, 1L, "doc_id", "text", accepted, index)
        assert(CurationStream.accepted(spark, accepted).count() == docs.count(),
          s"round $round: replay must be idempotent")
      } finally srv.stop()
    }
  }
}
