package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query cost anatomy (optimization-guide §1: measure first): for each
  * named declared query, run one untimed warm rep, then a timed rep that
  * counts Spark jobs / stages / tasks and sums executor task time via a
  * listener. At sf0.1 the harness tables are small (5k docs / 2k vectors /
  * 600k lineitem), so wall − Σtask/cores ≈ the driver-side floor
  * (planning, AQE stage turnaround, task scheduling, collect legs) — the
  * split says whether a slow query needs a better PLAN (compute-bound) or
  * FEWER JOBS/STAGES (overhead-bound). Diagnostic tool only; not part of
  * the driver contract.
  *
  * Usage: `runMain graft.tools.Profile [sfDir] [query ...]`
  * (default: the bench top-20 by round-12 baseline cost).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "dedup_purge", "sim_search_batch_pq_check", "dedup_cluster",
      "edit_distance", "sim_search_batch_pq", "knn_join_check",
      "dedup_minhash_check", "dedup_containment", "dedup_ngram",
      "knn_join", "dedup_embedding", "media_features", "dedup_audio_check",
      "dedup_embedding_check", "dedup_video_check", "winnow_pairs",
      "contamination_bloom", "dedup_video", "unigram_sample_check",
      "dedup_media_check")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      // match the bench session's generated-class cache (see Bench) so
      // profiled floors reflect the shipped configuration
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)   // executor run time
    val gcMs = new AtomicLong(0L)
    val serMs = new AtomicLong(0L)    // result + deserialize
    // per-stage anatomy for SPARK_GRAFT_PROFILE_STAGES=1: stageId →
    // (tasks, runMs, desc)
    val verbose = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")
    val stageTasks =
      new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageName.put(s.stageInfo.stageId,
          s.stageInfo.name.takeWhile(_ != '\n').take(80))
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          serMs.addAndGet(m.resultSerializationTime +
            m.executorDeserializeTime)
          stageTasks.merge(t.stageId, (1, m.executorRunTime),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def once(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-30s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"task_s"}%7s ${"gc_s"}%5s ${"ser_s"}%5s " +
      f"${"floor_s"}%7s")
    names.foreach { name =>
      try {
        once(name) // warm: codegen + memoized artifacts outside the window
        spark.catalog.clearCache()
        // settle the listener bus so the warm rep's events don't bleed in
        // (private API — a short sleep is the public-surface equivalent)
        Thread.sleep(300)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskMs.set(0); gcMs.set(0); serMs.set(0)
        stageTasks.clear(); stageName.clear()
        val t0 = System.nanoTime()
        once(name)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val cores = cpus.toInt
        // wall minus the perfectly-parallel share of executor time =
        // everything the driver serializes (planning, stage turnaround,
        // scheduling, collects) plus parallel-tail slack
        val floor = wall - taskMs.get() / 1e3 / cores
        println(f"$name%-30s $wall%7.2f ${jobs.get()}%5d ${stages.get()}%6d " +
          f"${tasks.get()}%6d ${taskMs.get() / 1e3}%7.2f " +
          f"${gcMs.get() / 1e3}%5.2f ${serMs.get() / 1e3}%5.2f $floor%7.2f")
        if (verbose) {
          import scala.jdk.CollectionConverters._
          stageTasks.asScala.toSeq.sortBy(-_._2._2).take(15).foreach {
            case (sid, (n, ms)) =>
              println(f"    stage $sid%5d tasks=$n%4d run=${ms / 1e3}%7.2fs " +
                s" ${stageName.getOrDefault(sid, "?")}")
          }
        }
      } catch {
        // NonFatal only (ADVICE r12): a fatal error (OutOfMemoryError,
        // linkage) leaves the JVM corrupted — continuing the loop would
        // profile garbage; rethrow instead of swallowing
        case scala.util.control.NonFatal(e) =>
          println(s"$name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
