package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement notes:
  *  - results are written to the `noop` sink, not `.count()` — a count lets
  *    Spark prune projections/expressions and under-reports real work;
  *  - one untimed warmup query absorbs JVM/codegen/parquet-footer costs so
  *    per-query numbers reflect steady state;
  *  - local[32] with shuffle.partitions=32 (builder prompt) — matched
  *    parallelism, no 200-partition default.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup (untimed): JVM + codegen + parquet footers — touch EVERY
    // harness table, not just events, so no timed query pays first-read
    // footer costs
    try {
      once(SparkEntry.queries("scan_range"))
      Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
        "region", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      }
    } catch { case _: Throwable => }

    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try once(fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // defensive, outside the timed window: drop any DataFrame caches a
      // query left behind so queries stay independent measurements
      // (localCheckpoint blocks release when their RDDs GC)
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failures are carried IN the emitted line — a crashing query must not
    // read as a faster, healthy run
    val fail = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fail,"sf":"$sfDir"}""")
    spark.stop()
  }
}
