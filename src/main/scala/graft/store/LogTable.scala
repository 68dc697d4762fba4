package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The store layer (SURVEY.md §1.1e): per-filter append-only indexed log +
  * tiny KV metadata table, over parquet directories.
  *
  * Reference contract (`store/store.go:6-36`): `LastIndex`, `StoreLogs`
  * (append batch with consecutive indices), `RemoveLogs(n)` (truncate
  * suffix), `GetLog(n)` (point read). The filter hash namespaces everything
  * (`tracker.go:188`): here it is the directory name, so different standing
  * queries never share files and a filter's whole history is one
  * partition-pruned path.
  *
  * Scale design:
  *  - data lands partitioned by `block_range` (block_num div 10_000) so both
  *    range scans (S1) and reorg truncation (S9) touch only the tail
  *    partition directories, never the full history;
  *  - appends assign indices as `base + position within the batch` via the
  *    ranged two-pass scheme (repartitionByRange + per-partition counts →
  *    offsets, [[graft.ops.LogOps.withAppendIndexRanged]]) — the global
  *    sequence comes from the checkpointed LastIndex and NO single-partition
  *    sort exists anywhere on the append path, however large the batch;
  *  - truncation rewrites only the partitions holding `indx >= n` — an
  *    engine with a transactional table format (Delta/Iceberg) would issue a
  *    metadata-only DELETE; plain parquet needs the rewrite, and reorgs only
  *    ever touch the last `MaxBlockBacklog` blocks by construction
  *    (`tracker.go:296`).
  */
final class LogTable(spark: SparkSession, root: String, filterHash: String,
    /** Blocks per at-rest partition directory. */
    val blocksPerRange: Long = 10000L) extends LogStore {

  private val dir = s"$root/logs/filter_hash=$filterHash"

  /** Tiny versioned metadata store for the truncation journal — its
    * versioned-`_SUCCESS` commit is the ATOMIC POINTER this table's
    * crash-safe truncation pivots on (the plain-parquet analog of a
    * Delta/Iceberg metadata commit; ref `bolt_store.go:180-197`
    * transactional truncate).
    */
  private lazy val meta = new KvStore(spark, s"$root/logs_meta/filter_hash=$filterHash")
  private def metaDirExists: Boolean =
    new java.io.File(s"$root/logs_meta/filter_hash=$filterHash/kv").exists()
  private val intentKey = "truncate_intent"
  @volatile private var intentChecked = false

  def exists: Boolean =
    new java.io.File(dir).exists() && read.limit(1).count() > 0

  /** Missing directory = genuinely fresh store → empty; any OTHER failure
    * (I/O, corrupt footer) propagates — silently treating it as "fresh"
    * would reset lastIndex to 0 and corrupt the monotonic sequence. A
    * crashed maintenance operation self-heals first: a pending truncation
    * intent rolls forward ([[recoverPendingTruncation]]) and a crashed
    * compaction swap rolls forward/back ([[recoverCompaction]]) before
    * the directory is interpreted.
    */
  def read: DataFrame = {
    recoverPending()
    readNoRecover
  }

  private def recoverPending(): Unit = if (!intentChecked) {
    intentChecked = true
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs)
    recoverPendingTruncation(fs)
  }

  private def readNoRecover: DataFrame =
    if (!new java.io.File(dir).exists()) {
      // recoverCompaction has already rolled any crashed swap forward or
      // back, so a still-missing dir here is a genuinely fresh store —
      // unless a trash sibling survived recovery (only possible if the
      // heal itself failed), which must fail loudly, not read as empty
      val self = new java.io.File(dir)
      val siblings = Option(self.getParentFile)
        .flatMap(p => Option(p.listFiles()))
        .getOrElse(Array.empty[java.io.File])
      val strandedTrash =
        siblings.find(_.getName.startsWith(self.getName + ".trash-"))
      strandedTrash.foreach(t => throw new java.io.IOException(
        s"log table $dir missing but ${t.getPath} exists — a compaction " +
          "swap crashed mid-rename and self-heal failed; rename the trash " +
          "dir back to recover"))
      emptyLogs
    } else if (!hasParquetFiles(new java.io.File(dir))) {
      // a reorg that truncates EVERY stored log leaves the dir with no
      // data files (only _SUCCESS markers); schema inference would throw,
      // bricking the store — that state is a legitimately empty table
      emptyLogs
    } else spark.read.parquet(dir)

  private def hasParquetFiles(f: java.io.File): Boolean =
    if (f.isFile) f.getName.endsWith(".parquet")
    else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .exists(hasParquetFiles)

  private def emptyLogs: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("indx", LongType), StructField("tx_index", LongType),
        StructField("tx_hash", StringType), StructField("block_num", LongType),
        StructField("block_hash", StringType), StructField("address", StringType),
        StructField("topics", ArrayType(StringType)),
        StructField("data", StringType), StructField("block_range", LongType)
      ))
    )
  }

  /** A2 — next append index (max+1, empty → 0); a driver-side Long because
    * it seeds the next batch's index range (ref `store/store.go:25-26`).
    */
  def lastIndex(): Long =
    read.agg(coalesce(max(col("indx")) + 1L, lit(0L))).head().getLong(0)

  /** S8/W1 — append a batch of logs, assigning consecutive indices
    * `base, base+1, …` in (block_num, tx_index) order
    * (ref `postgresql_store.go:110-150`). One atomic parquet append per
    * batch = the reference's per-batch transaction.
    */
  def storeLogs(batch: DataFrame): Long = {
    val base = lastIndex()
    // tx_hash in the order makes the assignment deterministic when a tx
    // emits several logs (same block_num+tx_index); rows identical in all
    // three are interchangeable, so any tie-break there is immaterial.
    // Ranged two-pass assignment (repartitionByRange + per-partition
    // counts → offsets) — no single-partition global window, so a
    // 20,000-block backfill batch fans out instead of funneling through
    // one task (see LogOps.withAppendIndexRanged).
    val indexed = graft.ops.LogOps.withAppendIndexRanged(batch, base,
        Seq(col("block_num"), col("tx_index"), col("tx_hash")))
      .withColumn("block_range", col("block_num") / lit(blocksPerRange))
      .withColumn("block_range", floor(col("block_range")))
      .persist()
    val n = indexed.count() // single evaluation of the (possibly remote) batch
    indexed.write
      .mode(SaveMode.Append)
      .partitionBy("block_range")
      .parquet(dir)
    indexed.unpersist()
    base + n
  }

  /** S9 — RemoveLogs(n): delete every log with `indx >= n`
    * (ref `postgresql_store.go:153-158`). Partition-pruned rewrite: only
    * `block_range` directories that actually contain removed rows are
    * rebuilt — everything below them is untouched, so a reorg (bounded to
    * the last `MaxBlockBacklog` blocks, ref `tracker.go:296`) rewrites at
    * most the one or two tail partitions regardless of table size. An
    * engine on a transactional format (Delta/Iceberg) would make this a
    * metadata-only DELETE; the swap below is the plain-parquet equivalent.
    * Returns the removed logs in ascending order (the retraction emission
    * order after revertLogs, ref `tracker.go:756-761`).
    */
  def removeLogsFrom(n: Long): DataFrame = removeLogsFrom(n, crashAt = "")

  /** Crash-injection hook for the truncation protocol spec: throws at the
    * named point ("after-write", "after-intent", "mid-swap") so StoreSpec
    * can kill the process-equivalent at every window and assert what a
    * fresh reader sees.
    */
  private[graft] final class InjectedCrash(at: String)
    extends RuntimeException(s"injected crash at $at")
  private def crash(at: String, crashAt: String): Unit =
    if (at == crashAt) throw new InjectedCrash(at)

  /** Truncation protocol (crash-safe; single writer):
    *  1. survivors of affected partitions → a fresh tmp dir
    *     (crash ⇒ live table untouched; the orphan tmp is swept later);
    *  2. ONE versioned KV commit journals the intent
    *     {tmp, swap ranges, delete-only ranges} — THE atomic pointer: the
    *     table is old before this commit, new after it;
    *  3. per-partition delete+rename swaps, each idempotent
    *     (crash ⇒ the next read()'s [[recoverPendingTruncation]] replays
    *     step 3 to completion — roll-forward, never rollback);
    *  4. clear the intent, drop the tmp dir.
    */
  private[graft] def removeLogsFrom(n: Long, crashAt: String): DataFrame = {
    val current = read.cache() // read() also recovers any pending intent
    var survivors: Option[DataFrame] = None
    try {
      // pin the removed set on the DRIVER before deleting its source files —
      // a cached plan can be evicted and recomputed against the rewritten
      // directory; the set is reorg-bounded (≤ MaxBlockBacklog blocks), so
      // collecting is safe by construction
      val removedRows = current.where(col("indx") >= n)
        .orderBy(col("indx")).collect()
      val removed = spark.createDataFrame(
        spark.sparkContext.parallelize(removedRows.toSeq, 1),
        current.schema)
      // partition-dir values are type-inferred on read (int, not long)
      val affected = removed.select(col("block_range").cast("long")).distinct()
        .collect().map(_.getLong(0))
      if (affected.nonEmpty) {
        val surv = current
          .where(col("block_range").isin(affected.map(Long.box): _*) &&
            col("indx") < n)
          .cache()
        survivors = Some(surv)
        surv.count()
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val tmp = s"$dir.tmp-${System.nanoTime()}"
        surv.write.mode(SaveMode.Overwrite)
          .partitionBy("block_range").parquet(tmp)
        crash("after-write", crashAt)
        // a partition whose every row was removed has no tmp output — for
        // it the delete IS the whole swap
        val swapRanges = affected.filter(r =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/block_range=$r")))
        val deleteOnly = affected.filterNot(swapRanges.contains)
        meta.set(intentKey,
          s"$tmp|${swapRanges.mkString(",")}|${deleteOnly.mkString(",")}")
        crash("after-intent", crashAt)
        applySwaps(fs, tmp, swapRanges, deleteOnly, crashAt)
        meta.set(intentKey, "")
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      removed
    } finally {
      // unpersist on EVERY exit: an exception mid-protocol must not leave
      // a stale cached relation over the (possibly rewritten) directory
      survivors.foreach(_.unpersist())
      current.unpersist()
    }
  }

  /** Step 3 of the protocol — idempotent per-partition swaps: a range
    * whose tmp dir is gone was already swapped by a previous attempt.
    */
  private def applySwaps(fs: org.apache.hadoop.fs.FileSystem, tmp: String,
      swapRanges: Seq[Long], deleteOnly: Seq[Long], crashAt: String = ""): Unit = {
    var first = true
    swapRanges.foreach { r =>
      val dst = new org.apache.hadoop.fs.Path(s"$dir/block_range=$r")
      val src = new org.apache.hadoop.fs.Path(s"$tmp/block_range=$r")
      if (fs.exists(src)) {
        fs.delete(dst, true)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"rename $src -> $dst failed")
      }
      if (first) { first = false; crash("mid-swap", crashAt) }
    }
    deleteOnly.foreach { r =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/block_range=$r"), true)
    }
    // files changed underneath any existing reader: drop cached plans and
    // stale listings over this path
    spark.catalog.refreshByPath(dir)
  }

  /** Roll a crashed truncation forward (intent journaled but swaps
    * incomplete) and sweep orphan tmp dirs (crash BEFORE the intent
    * commit). Runs once per LogTable instance, before the first read —
    * single-writer contract makes that sufficient: only a crashed
    * predecessor can leave a pending intent.
    */
  /** Self-heal a crashed compaction swap (the truncation journal's
    * sibling). [[swapInto]]'s windows and their recoveries:
    *  - crash during the tmp write (live dir untouched): the partial
    *    `.compact-*` orphan is swept;
    *  - crash between the two renames (live dir aside in `.trash-*`, new
    *    table complete in `.compact-*` — Spark's `_SUCCESS` marker is the
    *    completeness witness): roll FORWARD, renaming the tmp in;
    *    without a complete tmp, roll BACK the trash;
    *  - crash after the swap, before the trash delete: the trash is
    *    post-swap garbage and is swept.
    * Idempotent; runs once per instance before the first read
    * (single-writer contract — only a crashed predecessor can strand
    * these states).
    */
  private def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val self = new java.io.File(dir)
    def siblings(prefix: String): Seq[java.io.File] =
      Option(self.getParentFile).flatMap(p => Option(p.listFiles()))
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.startsWith(self.getName + prefix)).toSeq
    val trashes = siblings(".trash-")
    val tmps = siblings(".compact-")
    if (trashes.isEmpty && tmps.isEmpty) return
    def hp(f: java.io.File) = new org.apache.hadoop.fs.Path(f.getPath)
    val dst = new org.apache.hadoop.fs.Path(dir)
    if (!self.exists() && trashes.nonEmpty) {
      val complete = tmps.find(t => new java.io.File(t, "_SUCCESS").exists())
      val src = complete.getOrElse(trashes.maxBy(_.getName))
      if (!fs.rename(hp(src), dst))
        throw new java.io.IOException(
          s"compaction self-heal: rename ${src.getPath} -> $dir failed")
      spark.catalog.refreshByPath(dir)
    }
    // Stranded siblings are garbage once a live dir exists — but a tmp
    // could also belong to an IN-FLIGHT compaction by another process
    // (readers are allowed concurrently; only writes are single-owner),
    // so tmps are swept only when stale. Trash sweeping is always safe:
    // with a live dir it is post-swap garbage, and the owner's own
    // cleanup delete no-ops if we get there first.
    val staleMs = 60L * 60 * 1000
    if (new java.io.File(dir).exists()) {
      siblings(".trash-").foreach(f => fs.delete(hp(f), true))
      siblings(".compact-")
        .filter(f => System.currentTimeMillis() - f.lastModified() > staleMs)
        .foreach(f => fs.delete(hp(f), true))
    }
  }

  private def recoverPendingTruncation(
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    if (metaDirExists) {
      meta.get(intentKey).filter(_.nonEmpty).foreach { s =>
        val parts = s.split("\\|", 3)
        def ranges(x: String) =
          x.split(",").filter(_.nonEmpty).map(_.toLong).toSeq
        applySwaps(fs, parts(0), ranges(parts(1)), ranges(parts(2)))
        meta.set(intentKey, "")
        fs.delete(new org.apache.hadoop.fs.Path(parts(0)), true)
      }
      // orphan tmp dirs from pre-intent crashes: invisible to readers,
      // swept here so they cannot accumulate. Stale-only, like the
      // `.compact-*` sweep: the store allows concurrent READERS, and a
      // fresh reader racing a live writer (between its survivor write and
      // its intent commit) must not delete the in-flight tmp — the writer
      // would then journal a delete-only intent and drop partitions
      // without replacing survivors.
      val staleMs = 60L * 60 * 1000
      val self = new java.io.File(dir)
      Option(self.getParentFile).flatMap(p => Option(p.listFiles()))
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.startsWith(self.getName + ".tmp-"))
        .filter(t => System.currentTimeMillis() - t.lastModified() > staleMs)
        .foreach(t => fs.delete(
          new org.apache.hadoop.fs.Path(t.getPath), true))
    }
  }

  /** S10 — point read (pushed-down unique-key predicate). */
  def getLog(n: Long): DataFrame = read.where(col("indx") === n)

  /** Swap a freshly-written directory into place without a
    * destroy-before-replace window: the live dir is RENAMED aside (not
    * deleted) before the replacement moves in, so a crash at any point
    * leaves the data recoverable under `<dir>` or `<dir>.trash-*` — the
    * same no-lost-state discipline as KvStore's versioned commits. The
    * brief not-found window between the two renames only affects
    * concurrent readers, which the store contract (single writer, reads
    * re-plan per query) already tolerates.
    */
  private def swapInto(fs: org.apache.hadoop.fs.FileSystem, tmp: String,
      crashAt: String = ""): Unit = {
    // Hadoop FileSystem.rename reports failure by RETURNING FALSE, not
    // throwing — an unchecked rename-aside would let the second rename
    // move tmp INSIDE the still-present live dir (nested garbage) or
    // silently abandon the rewrite. Abort loudly instead; every failure
    // mode leaves the data intact under dir, trash, or tmp.
    def mustRename(from: org.apache.hadoop.fs.Path,
        to: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")
    val dst = new org.apache.hadoop.fs.Path(dir)
    val trash = new org.apache.hadoop.fs.Path(s"$dir.trash-${System.nanoTime()}")
    if (fs.exists(dst)) mustRename(dst, trash)
    crash("compact-after-aside", crashAt)
    try mustRename(new org.apache.hadoop.fs.Path(tmp), dst)
    catch {
      case e: Throwable =>
        // roll the live dir back so a failed swap leaves the table
        // readable in place; if even the rollback fails, the next read's
        // recoverCompaction self-heals from the stranded trash dir
        if (fs.exists(trash)) fs.rename(trash, dst)
        throw e
    }
    crash("compact-before-trash-delete", crashAt)
    fs.delete(trash, true)
  }

  /** Shared compaction scaffold: rewrite every partition into one file,
    * rows clustered by `sortKeys`, then swap atomically-as-possible
    * (see [[swapInto]]). No-op on an empty/fresh table — swapping in a
    * row-less directory (which parquet writes with no data files) would
    * leave a dir that fails schema inference on every later read.
    *
    * The source dir stays intact until the tmp write has fully succeeded,
    * so the write streams straight from the live files — no cache/
    * materialization pass (unlike removeLogsFrom, which deletes the very
    * partitions it reads and must pin rows first).
    */
  private def rewriteClustered(sortKeys: Seq[org.apache.spark.sql.Column],
      crashAt: String = ""): Unit = {
    if (!new java.io.File(dir).exists() || read.isEmpty) return
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = s"$dir.compact-${System.nanoTime()}"
    read
      .repartition(col("block_range"))
      // lead with the partition column: FileFormatWriter requires data
      // sorted by partition cols and would otherwise inject its own
      // (unstable) sort, destroying the clustering
      .sortWithinPartitions(col("block_range") +: sortKeys: _*)
      .write.mode(SaveMode.Overwrite).partitionBy("block_range").parquet(tmp)
    crash("compact-after-write", crashAt)
    swapInto(fs, tmp, crashAt)
  }

  /** Layout maintenance: rewrite every partition clustered by
    * `(block_num, tx_index)` and collapsed to one file per partition dir.
    * Streaming appends leave one small file per micro-batch with
    * interleaved block ranges; after compaction each file's
    * `block_num`/`indx` min-max stats are tight, so ranged scans (S1) and
    * reorg truncation (S9) skip whole row groups. This is the
    * OPTIMIZE/Z-ORDER analog for plain parquet — single sort key because
    * the access pattern is one-dimensional (block order ≡ index order).
    */
  def compact(): Unit = compact(crashAt = "")

  /** Crash-injection twin of [[compact]] for the protocol spec. */
  private[graft] def compact(crashAt: String): Unit =
    rewriteClustered(Seq(col("block_num"), col("tx_index")), crashAt)

  /** Two-dimensional layout maintenance: like [[compact]], but clusters
    * each partition by a Morton key over (block_num, xxhash64(address)) —
    * the reference's two real access dimensions (ranged scans S1 ×
    * address-filtered standing queries P1). Z-ordering makes BOTH the
    * per-file `block_num` min/max AND the per-file `address` value set
    * tight, so either predicate prunes row groups; a block-only sort
    * leaves every file spanning all addresses. Within-partition file
    * count stays 1; the clustering only reorders rows.
    */
  def compactZOrdered(bits: Int = 16): Unit = {
    require(blocksPerRange <= (1L << bits),
      s"blocksPerRange=$blocksPerRange exceeds the $bits-bit Z budget")
    rewriteClustered(Seq(graft.ops.Layout.zorderKey(
      // PARTITION-RELATIVE block coordinate: raw low bits of block_num
      // wrap every 2^bits blocks, and a block_range straddling that
      // boundary would sort post-wrap blocks first — destroying exactly
      // the block clustering this method exists for. block_num mod
      // blocksPerRange is monotone within every partition and fits the
      // bit budget (blocksPerRange defaults to 10000 < 2^16).
      pmod(col("block_num"), lit(blocksPerRange)),
      // hash the address so the second dimension is dense + numeric;
      // pruning still works on the raw address column's file stats
      xxhash64(col("address")).bitwiseAND((1L << bits) - 1), bits)))
  }
}

/** S6/S7 — string→string KV metadata store (genesis hash, chainID,
  * lastBlock checkpoint, filter registry — ref `store/store.go:8-14`).
  * Tiny by construction (a handful of keys per filter), so the upsert is a
  * read-modify-rewrite of one small parquet; at scale this is the streaming
  * checkpoint / a Delta MERGE, never a data-sized table.
  *
  * Crash safety: every write lands in a fresh `v<nanos>` directory whose
  * `_SUCCESS` marker is written last by the commit protocol; readers pick
  * the newest *complete* version and stale versions are pruned on the next
  * write. There is no delete-before-rename window — a crash at any point
  * leaves the previous version readable (losing the checkpoint would
  * otherwise silently re-backfill the whole history on restart).
  *
  * Single-writer by design: the reference's store is driven by one sync
  * goroutine per filter (`tracker.go:582`) and this engine keeps that
  * contract — the KV is per-tracker metadata, not a shared database.
  */
/** A compare-and-set commit lost its race: the expected version was no
  * longer the newest committed one, or another writer claimed the next
  * version number first. Callers rebase on the fresh state and retry
  * (see [[TxLogTable.storeLogs]]).
  */
final class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)

object KvStore {
  // one monitor per store directory (same-JVM compare-and-set writers
  // serialize here; see setAll)
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[store] def commitMonitor(dir: String): Object =
    monitors.computeIfAbsent(dir, _ => new Object)

  /** How many committed KV versions a commit retains (newest inclusive).
    * Non-atomic list-then-read readers stay whole as long as a concurrent
    * committer can't burn through this many commits between their list
    * and their read.
    */
  private[store] val retainKvVersions = 4

  /** Missing-path detector shared by every list-then-read retry (this
    * store's readers and the CDC manifest poller): walks the cause chain
    * and matches the message variants different filesystems / wrapping
    * layers surface a pruned path as — a bare FileNotFoundException case
    * misses object-store and Spark-wrapped forms.
    */
  private[graft] def isMissingPath(e: Throwable): Boolean =
    e != null && (e.isInstanceOf[java.io.FileNotFoundException] ||
      (e.getMessage != null && (e.getMessage.contains("Path does not exist") ||
        e.getMessage.contains("PATH_NOT_FOUND") ||
        e.getMessage.contains("No such file"))) ||
      isMissingPath(e.getCause))
}

final class KvStore(spark: SparkSession, root: String,
    val retainVersions: Int = KvStore.retainKvVersions)
    extends KeyValueStore {
  require(retainVersions >= 2,
    s"retainVersions must be >= 2 (newest + at least one reader window), " +
      s"got $retainVersions")
  private val dir = s"$root/kv"

  // scheme-aware: the store root decides the filesystem (HDFS/object
  // store/local), not fs.defaultFS — a table on s3a:// must not be probed
  // through the cluster's default HDFS
  private def fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** Readers list-then-read non-atomically; a concurrent committer prunes
    * superseded versions, so the version a reader just listed can vanish
    * before the read lands. Two defenses: commits RETAIN the last
    * [[retainVersions]] versions (the common window — a DIAL, sized to
    * how many commits a committer storm can land inside one reader's
    * list-to-read gap), and this retry re-lists on a missing-path failure
    * (the pathological one) — the re-list pins the new newest version, so
    * the retried read is against a version the pruner must retain. A
    * reader that STILL loses after every retry (a storm sustained through
    * all 8 re-lists) fails LOUDLY with the dial named, not with the raw
    * FileNotFound of whichever version vanished last.
    */
  private def withReadRetry[A](body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Exception if KvStore.isMissingPath(e) =>
          if (attempt >= 8) throw new IllegalStateException(
            s"kv read at $dir outlived the retention window across " +
              s"$attempt re-list retries (retainVersions=$retainVersions); " +
              "a sustained commit storm is pruning versions faster than " +
              "this reader re-lists — raise retainVersions on the writer",
            e)
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Complete (committed) versions, oldest→newest. */
  private def versions(): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .flatMap { st =>
        val name = st.getPath.getName.drop(1)
        if (name.forall(_.isDigit) &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          Some(name.toLong -> st.getPath)
        else None
      }
      .sortBy(_._1)
  }

  /** Test seam: runs after a reader pins the newest version path and
    * before the pinned read executes — the retention-boundary spec
    * interleaves a deterministic concurrent-committer storm here (a real
    * thread race between lister and pruner would be flaky).
    */
  private[graft] var afterPin: () => Unit = () => ()

  def read: DataFrame =
    versions().lastOption match {
      case Some((_, p)) => afterPin(); spark.read.parquet(p.toString)
      case None =>
        spark.createDataFrame(Seq.empty[(String, String)]).toDF("key", "value")
    }

  def get(key: String): Option[String] = withReadRetry {
    read.where(col("key") === key).select("value")
      .collect().headOption.map(_.getString(0))
  }

  /** One key plus the commit version it was read at — the snapshot a
    * compare-and-set commit ([[setAll]] with `expectedVersion`) validates
    * against. Version 0 = no committed version yet.
    */
  def getWithVersion(key: String): (Option[String], Long) = withReadRetry {
    versions().lastOption match {
      case None => (None, 0L)
      case Some((v, p)) =>
        afterPin()
        (spark.read.parquet(p.toString).where(col("key") === key)
          .select("value").collect().headOption.map(_.getString(0)), v)
    }
  }

  /** Upsert (ref `postgresql_store.go:72` ON CONFLICT DO UPDATE). */
  def set(key: String, value: String): Unit = setAll(Map(key -> value))

  /** Batched upsert — one versioned rewrite for any number of keys (a
    * checkpoint writes lastBlock + header backlog together).
    *
    * `drop` removes matching keys in the SAME commit (bounded-history
    * pruning); `expectedVersion` turns the write into a compare-and-set:
    * the commit aborts with [[ConcurrentCommitException]] unless the
    * newest committed version still equals it. Losing a claim race for
    * the next version number also aborts — the per-version `.claim` file
    * is the mutual-exclusion primitive (put-if-absent; atomic on HDFS
    * `create(overwrite=false)`, conditional-put on object stores). Stale
    * claims (a claimant that crashed pre-commit) unblock after
    * `claimStaleMs`.
    */
  def setAll(kvs: Map[String, String], drop: String => Boolean = _ => false,
      expectedVersion: Option[Long] = None,
      claimStaleMs: Long = 10L * 60 * 1000): Unit =
    // same-JVM writers serialize on a per-store monitor: the claim file
    // arbitrates distinct PROCESSES (atomic create on HDFS, conditional
    // put on object stores), but a local filesystem's exclusive create is
    // check-then-act, so two threads of one driver need the lock the
    // filesystem can't give them. Cross-process local-FS writers remain
    // best-effort — documented, and not the deployment shape (one driver
    // per store root).
    if (expectedVersion.isDefined)
      KvStore.commitMonitor(dir).synchronized {
        setAllLocked(kvs, drop, expectedVersion, claimStaleMs)
      }
    else setAllLocked(kvs, drop, expectedVersion, claimStaleMs)

  /** Test seam: the commit path WITHOUT the same-JVM monitor — the claim
    * contract test drives two writer "processes" through it over a
    * deliberately non-atomic filesystem to prove the protocol's
    * cross-process guarantees don't secretly lean on the monitor.
    */
  private[store] def setAllNoMonitor(kvs: Map[String, String],
      expectedVersion: Option[Long]): Unit =
    setAllLocked(kvs, _ => false, expectedVersion, 10L * 60 * 1000)

  /** Test seam: runs after claim acquisition + in-claim re-validation and
    * before the target write — the claim contract test interleaves a
    * competing committer here DETERMINISTICALLY (thread races would be
    * flaky) to prove the protocol's behavior on both atomic and
    * non-atomic filesystems.
    */
  private[store] var beforeWrite: () => Unit = () => ()

  private def setAllLocked(kvs: Map[String, String], drop: String => Boolean,
      expectedVersion: Option[Long], claimStaleMs: Long): Unit = {
    def requireAt(e: Long): Unit = {
      val have = versions().lastOption.map(_._1).getOrElse(0L)
      if (have != e) throw new ConcurrentCommitException(
        s"expected version $e but newest committed is $have")
    }
    val cur = versions().lastOption
    expectedVersion.foreach(requireAt)
    val updated = read
      .where(!col("key").isin(kvs.keys.toSeq: _*))
      .filter(r => !drop(r.getString(0)))
      .unionByName(spark.createDataFrame(kvs.toSeq).toDF("key", "value"))
      .collect() // tiny by construction; pin before touching directories
    // Monotonic across JVM restarts: nanoTime's origin is arbitrary per JVM
    // (boot-relative on Linux), so a restart could mint a version SMALLER
    // than an existing one and read() would pin to the stale dir forever.
    val v = cur.map(_._1 + 1L).getOrElse(System.currentTimeMillis())
    // the claim is named by the version the writer is advancing FROM, so
    // any two writers that read the same snapshot contend on one file —
    // including on an empty store, where the target version is minted
    // from the clock and would otherwise differ between them
    val claim = new org.apache.hadoop.fs.Path(
      s"$dir/cas${expectedVersion.getOrElse(0L)}.claim")
    if (expectedVersion.isDefined) {
      // sweep dead claims: their base version is already superseded, or
      // the claimant crashed pre-commit and the claim went stale
      val basePath = new org.apache.hadoop.fs.Path(dir)
      (if (fs.exists(basePath)) fs.listStatus(basePath).toSeq else Seq.empty)
        .filter(_.getPath.getName.endsWith(".claim"))
        .filter { st =>
          val cv = st.getPath.getName.stripPrefix("cas").stripSuffix(".claim")
          (cv.forall(_.isDigit) && cv.nonEmpty &&
            cv.toLong < cur.map(_._1).getOrElse(0L)) ||
            System.currentTimeMillis() - st.getModificationTime > claimStaleMs
        }
        .foreach(st => fs.delete(st.getPath, false))
      try fs.create(claim, false).close()
      catch {
        case _: java.io.IOException => throw new ConcurrentCommitException(
          s"advance from version ${expectedVersion.get} already claimed " +
            "by a concurrent writer")
      }
      // re-validate INSIDE the claim: a winner may have committed and
      // released between the entry check and our acquisition — without
      // this, the loser would proceed to overwrite the winner's version
      try requireAt(expectedVersion.get)
      catch { case e: ConcurrentCommitException =>
        fs.delete(claim, false); throw e
      }
    }
    try {
      beforeWrite()
      // a crashed earlier commit can leave a partial target dir; clear it
      // or the write below stalls forever. _SUCCESS-guarded: a committed
      // dir is never deleted, whatever state the version math is in
      val target = new org.apache.hadoop.fs.Path(s"$dir/v$v")
      val committed = fs.exists(target) &&
        fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS"))
      if (committed && expectedVersion.isDefined)
        // LAST line of defense on filesystems whose exclusive create is
        // itself check-then-act (plain local FS): if two writers both
        // "won" the claim, the versions they mint collide — the loser
        // detects the winner's committed target here and aborts instead
        // of silently overwriting it. Lost CLAIM, never a lost UPDATE.
        throw new ConcurrentCommitException(
          s"version $v already committed by a concurrent writer " +
            "(non-atomic claim detected at the target)")
      if (fs.exists(target) && !committed)
        fs.delete(target, true)
      spark.createDataFrame(
        spark.sparkContext.parallelize(updated.toSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
        .write.parquet(target.toString)
    } finally if (expectedVersion.isDefined) fs.delete(claim, false): Unit
    // prune superseded versions but RETAIN a short window: readers
    // list-then-read non-atomically, so deleting the version a reader just
    // listed fails its read with FileNotFound — retaining the last few
    // (plus the reader-side re-list retry) closes the window. Tiny dirs;
    // the retained count is versions, not data.
    versions().filter(_._1 < v).dropRight(retainVersions - 1)
      .foreach(x => fs.delete(x._2, true))
  }

  /** S7 — prefix scan (ref `store/store.go:11`). */
  def listPrefix(prefix: String): DataFrame =
    read.where(col("key").startsWith(prefix)).orderBy("key")

  /** Materialized prefix scan with the reader retry applied — for callers
    * that collect anyway (manifest/history loads); the lazy [[listPrefix]]
    * can't be retried once it leaves this class.
    */
  def getPrefix(prefix: String): Seq[(String, String)] = withReadRetry {
    read.where(col("key").startsWith(prefix))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)
  }
}
