package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Dedup, Lm, TextOps}

/** Streaming corpus-curation ingest — the composed intake shape of a
  * training-data pipeline, run per micro-batch:
  *
  *  1. QUALITY screen: [[TextOps.qualityVerdict]] must say `keep` (same
  *     rules as the `quality_filter` query — shared Column, cannot drift);
  *     optionally followed by the FLUENCY gate — mean bigram log-prob
  *     under a persisted offline-trained [[graft.ext.Lm]] model must clear
  *     a floor (the CCNet perplexity filter; see [[ingestBatch]]).
  *  2. EXACT dedup: normalized content hash (lowercase, strip punctuation,
  *     collapse whitespace — the `dedup_normalized` form); first doc per
  *     hash wins within the batch, and anything whose hash is already in
  *     the accepted corpus is dropped (anti-join on the STORED hash column
  *     — a column-pruned scan, the text is never re-hashed).
  *  3. NEAR-DUP screen: MinHash band candidates against the persisted band
  *     index ([[Dedup.candidatesAgainstIndex]]) plus in-batch candidates
  *     ([[Dedup.minHashCandidates]]), then EXACT Jaccard verification
  *     ([[Dedup.verifyJaccard]]) restricted to docs named in a candidate
  *     pair — per-batch cost is ∝ batch size + candidate matches, never
  *     ∝ accepted-corpus size. A verified pair kills its newer member:
  *     the batch doc when the partner is already accepted, the larger id
  *     when both arrived in this batch.
  *  4. COMMIT: survivors append to the accepted corpus under
  *     `ingest=<batchId>` (per-batch overwrite ⇒ an at-least-once replay
  *     of a micro-batch rewrites the same directory instead of
  *     duplicating it) and their band rows are added to the index so the
  *     NEXT batch dedups against them. An index replay appends duplicate
  *     band rows — harmless: candidate generation ends in `distinct()`,
  *     so duplicates cost a little read amplification, never wrong pairs.
  *
  * 100 TB shape: every stage is a narrow pass or a key-local join against
  * band-partitioned state; nothing rescans the accepted corpus except the
  * hash anti-join (column-pruned to 32 bytes/doc) and the verification
  * text fetch (semi-joined to candidate ids first). The reference's
  * ingest loop (`/root/reference/tracker.go:338-400`) has the same
  * append-only, idempotent-per-batch discipline.
  */
object CurationStream {

  /** Start the streaming ingest over a streaming `docs` frame. */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      acceptedPath: String,
      indexPath: String,
      checkpoint: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 16,
      maxBucket: Int = 1000,
      lmModelPath: Option[String] = None,
      minAvgLogp: Double = Double.NegativeInfinity
  ): StreamingQuery = {
    // load the model ONCE per run (three parquet reads), not per batch
    val lmModel = lmModelPath.map(p => Lm.load(docs.sparkSession, p))
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, idCol, textCol, acceptedPath, indexPath,
          shingleN, minJaccard, numHashes, bands, maxBucket,
          lmModel, minAvgLogp)
      }
      .start()
  }

  /** One curation micro-batch (exposed for direct batch testing — the
    * streaming path calls exactly this).
    *
    * `lmModel` (optional) engages a FLUENCY gate after the rule-based
    * quality screen: the batch is scored under the bigram model (trained
    * offline on a reference slice; [[start]] loads a persisted one ONCE
    * per run via [[Lm.load]]) and docs whose mean bigram log-probability
    * falls below `minAvgLogp` are dropped — the CCNet-style perplexity
    * filter, catching word-salad that reuses common words and so passes
    * every rule-based check. Docs too short to have bigrams carry no
    * evidence and pass. Per-batch cost is the model join ∝ batch size +
    * model size, never ∝ accepted-corpus size; the rule-screen output is
    * checkpointed so the gate's score branch and join branch share one
    * scan.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      acceptedPath: String,
      indexPath: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 16,
      maxBucket: Int = 1000,
      lmModel: Option[graft.ext.Lm.BigramModel] = None,
      minAvgLogp: Double = Double.NegativeInfinity
  ): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(acceptedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    // the accepted corpus EXCLUDING this batch's own partition: a replayed
    // batch (at-least-once foreachBatch) must not dedup against its own
    // previous partial commit — and partition-pruning that directory out
    // also keeps the lazy read from racing the overwrite of ingest=batchId
    def acceptedSoFar() = spark.read.parquet(acceptedPath)
      .where(col("ingest") =!= lit(batchId))

    // 1. quality screen
    val ruleKept = batch.where(TextOps.qualityVerdict(col(textCol)) === "keep")

    // 1b. fluency gate (optional): score under the bigram model, drop
    // docs below the mean-log-prob floor; scoreless (sub-2-token) docs
    // pass — no evidence either way. The screen output is checkpointed:
    // the gate consumes it twice (score branch + join branch)
    val kept = lmModel match {
      case None => ruleKept
      case Some(m) =>
        val screened = ruleKept.localCheckpoint(true)
        val scores = Lm.score(screened, idCol, textCol, m)
          .select(col(idCol), col("avg_logp"))
        screened.join(scores, Seq(idCol), "left")
          .where(col("avg_logp").isNull || col("avg_logp") >= minAvgLogp)
          .drop("avg_logp")
    }

    // 2. exact dedup on the normalized hash — first per hash in-batch,
    // then anti-join the accepted corpus's stored hashes
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), "\\s+", " "))
    val wFirst = Window.partitionBy("__nh").orderBy(idCol)
    val firstPerHash = kept.withColumn("__nh", sha2(norm, 256))
      .withColumn("__rk", row_number().over(wFirst))
      .where(col("__rk") === 1).drop("__rk")
    val exactSurvivors0 =
      if (!exists(acceptedPath)) firstPerHash
      else firstPerHash.join(
        acceptedSoFar().select("__nh").distinct(), Seq("__nh"), "left_anti")
    // several joins below consume this; one materialization beats three
    // recomputes of the window + anti-join
    val exactSurvivors = exactSurvivors0.localCheckpoint(true)

    // 3. near-dup screen: banded candidates (index + in-batch), exact
    // Jaccard verify on candidate docs only
    val inBatch = Dedup.minHashCandidates(exactSurvivors, idCol, textCol,
      shingleN, numHashes, bands, maxBucket)
    val cands0 =
      if (!exists(s"$indexPath/batch") && !exists(s"$indexPath/stream"))
        inBatch
      else inBatch.unionByName(Dedup.candidatesAgainstIndex(exactSurvivors,
        idCol, textCol, indexPath, shingleN, numHashes, bands, maxBucket))
    val cands = cands0.distinct().localCheckpoint(true)

    val survivors =
      if (cands.isEmpty) exactSurvivors
      else {
        val candIds = cands.select(col("id_a").as("__cid"))
          .unionByName(cands.select(col("id_b").as("__cid"))).distinct()
        val newDocs = exactSurvivors.select(col(idCol), col(textCol))
        val allDocs =
          if (!exists(acceptedPath)) newDocs
          else newDocs.unionByName(
            acceptedSoFar().select(col(idCol), col(textCol)))
        val needed = allDocs
          .join(candIds, allDocs(idCol) === col("__cid"), "left_semi")
        val verified = Dedup.verifyJaccard(cands, needed, idCol, textCol,
          shingleN).where(col("jaccard") >= minJaccard)
        // kill the newer member: id_a only when id_a is the lone batch-side
        // doc of the pair; otherwise id_b (covers both-in-batch — id_a <
        // id_b — and id_b-only-new)
        val batchIds = exactSurvivors.select(col(idCol).as("__bid"))
        val drops = verified
          .join(batchIds.withColumnRenamed("__bid", "__a_new"),
            col("id_a") === col("__a_new"), "left")
          .join(batchIds.withColumnRenamed("__bid", "__b_new"),
            col("id_b") === col("__b_new"), "left")
          .select(when(col("__a_new").isNotNull && col("__b_new").isNull,
            col("id_a")).otherwise(col("id_b")).as("__drop"))
          .distinct()
        exactSurvivors.join(drops,
          exactSurvivors(idCol) === col("__drop"), "left_anti")
      }

    // 4. commit: per-batch overwrite (idempotent replay) + index update
    survivors.write.mode("overwrite")
      .parquet(s"$acceptedPath/ingest=$batchId")
    Dedup.writeBandIndex(survivors, idCol, textCol, indexPath,
      shingleN, numHashes, bands)
  }

  /** The accepted corpus as written by [[ingestBatch]] (partition
    * discovery surfaces `ingest` as a column).
    */
  def accepted(spark: org.apache.spark.sql.SparkSession,
      acceptedPath: String): DataFrame =
    spark.read.parquet(acceptedPath)
}
