package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** ANN crossover harness: measures WHERE the approximate top-k tiers
  * (`sim_search_lsh` / `_ivf` / `_pq`) actually beat the brute-force scan
  * (`sim_search`) — RECALL.md's honest caveat was that at 2k–20k vectors
  * they sit BELOW the crossover (0.5–0.7×), leaving the 100 TB story
  * plan-shape-only. This runs the same corpus scaled 1× / 10× / 50×
  * (20k → 1M vectors via [[ScaleSoak.generateVectors]] — duplicate rate
  * scale-free) and reports, per scale and tier:
  *
  *  - `query_s`  — wall-clock per top-20 query (min over reps of the
  *    per-rep mean across `nQueries` distinct query vectors; the corpus
  *    and any index are persisted first, so this is the amortized
  *    serving cost, not an index build);
  *  - `recall`   — mean overlap@20 against the exact scan's answer at
  *    the SAME scale (the gate: a speedup at collapsed recall is noise);
  *  - `speedup`  — exact query_s / tier query_s at that scale;
  *  - `index_s`  — one-time index/persist cost (exact pays its cache
  *    materialization here too).
  *
  * Tier configs are the DECLARED query configs at every scale, plus a
  * `*_scaled` variant where the knob the design documents as the scale
  * dial is re-sized to the corpus (LSH: nbits so buckets stay ~4k docs;
  * IVF: nlist ≈ √N with the same nprobe/nlist probe fraction) — the
  * honest statement is "the declared config crosses over HERE; the
  * re-dialed config crosses over EARLIER/at recall X".
  *
  * One JSON line on stdout; recorded in SOAK.md / RECALL.md.
  */
object AnnCrossover {

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_ANN_FACTORS", "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = 20
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def cells(factor: Int): Seq[String] = {
      val dir =
        if (factor == 1) srcDir
        else {
          val d = sys.env.get("SPARK_GRAFT_SOAK_DIR")
            .map(b => s"$b-x$factor")
            .getOrElse(s"/tmp/graft-ann-x$factor")
          ScaleSoak.generateVectors(spark, srcDir, d, factor)
          d
        }
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding", "label").persist()
      val n = embs.count()
      val queries: Seq[Array[Float]] = embs.orderBy("vec_id")
        .limit(nQueries).select("embedding").as[Array[Float]]
        .collect().toSeq

      def qDf(qv: Array[Float]): DataFrame = Seq(qv).toDF("embedding")

      /** min over reps of mean-per-query seconds, running every query. */
      def time(run: Array[Float] => DataFrame): Double =
        (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          queries.foreach(qv => run(qv).collect(): Unit)
          (System.nanoTime() - t0) / 1e9 / queries.length
        }.min

      // exact tier: the truth sets double as the recall reference
      val exactS = time(qv =>
        Similarity.cosineTopK(embs, qDf(qv), "vec_id", "embedding", k))
      val truth: Seq[Set[Long]] = queries.map(qv =>
        Similarity.cosineTopK(embs, qDf(qv), "vec_id", "embedding", k)
          .select("vec_id").as[Long].collect().toSet)

      def recallOf(run: Array[Float] => DataFrame): Double =
        queries.zip(truth).map { case (qv, t) =>
          val got = run(qv).select("vec_id").as[Long].collect().toSet
          t.intersect(got).size.toDouble / t.size
        }.sum / queries.length

      def cell(name: String, indexS: Double,
          run: Array[Float] => DataFrame): String = {
        val s = time(run)
        val r = recallOf(run)
        f""""$name":{"query_s":$s%.4f,"recall":$r%.3f,""" +
          f""""speedup":${exactS / s}%.2f,"index_s":$indexS%.2f}"""
      }

      // LSH declared (nbits=4, probe 11/16 buckets) + scaled (buckets ~4k)
      def lsh(nbits: Int): Array[Float] => DataFrame = qv =>
        Similarity.annTopK(embs, qDf(qv), "vec_id", "embedding",
          dim = 64, nbits = nbits, k = k, probeHamming = 2)
      val nbitsScaled = math.min(12, math.max(4,
        (math.log(n.toDouble / 4096.0) / math.log(2.0)).ceil.toInt))

      // LSH with a PERSISTED bucket table (the writeBandIndex deployment
      // shape — the on-the-fly form recomputes every corpus signature per
      // query, which is what keeps it below crossover): buckets built
      // once, each query probes Hamming≤2 neighbors of its own bucket
      def lshIndexedCell(name: String, nbits: Int): String = {
        val t0 = System.nanoTime()
        val bucketed = Similarity.lshBucketed(embs, "embedding", 64, nbits)
          .persist()
        bucketed.count()
        val build = (System.nanoTime() - t0) / 1e9
        val flips = (0 until nbits).map(j => 1L << j) ++
          (for { i <- 0 until nbits; j <- i + 1 until nbits }
            yield (1L << i) | (1L << j))
        def run(qv: Array[Float]): DataFrame = {
          val q = Similarity.lshBucketed(qDf(qv), "embedding", 64, nbits)
            .select(col("embedding").as("__q"),
              col("lsh_bucket").as("__qb"))
          val probes = q.select(col("__q"), explode(array(
            (col("__qb") +: flips.map(m =>
              col("__qb").bitwiseXOR(lit(m)))): _*)).as("__qb"))
          bucketed.join(broadcast(probes),
              col("lsh_bucket") === col("__qb"))
            .select(col("vec_id"),
              Similarity.cosine(col("embedding"), col("__q")).as("cosine"))
            .orderBy(col("cosine").desc, col("vec_id")).limit(k)
        }
        val out = cell(name, build, run)
        bucketed.unpersist()
        out
      }

      // IVF declared (nlist=16, nprobe=8) + scaled (nlist ≈ √N, same
      // probe fraction) — index built & persisted once per config
      def ivfCell(name: String, nlist: Int, nprobe: Int): String = {
        val t0 = System.nanoTime()
        val (indexed, centroids) =
          Similarity.ivfIndex(embs, "vec_id", "embedding", nlist)
        val idx = indexed.persist()
        idx.count()
        val build = (System.nanoTime() - t0) / 1e9
        val out = cell(name, build, qv => Similarity.ivfTopK(idx, centroids,
          qv, "vec_id", "embedding", nprobe = nprobe, k = k))
        idx.unpersist()
        out
      }
      // √N capped at 256: ivfIndex's driver-local Lloyd's fit is
      // O(sample·nlist·dim) and the sample is nlist·64 — beyond ~256
      // cells the FIT would dominate the harness (a cluster deployment
      // distributes the fit; the crossover question is about QUERY cost)
      val nlistScaled = math.min(256,
        math.max(16, math.sqrt(n.toDouble).round.toInt))

      // PQ declared (m=8, 16-way codebooks, rerank 400)
      def pqCell(name: String): String = {
        val t0 = System.nanoTime()
        val (encoded, codebooks) =
          Similarity.pqIndex(embs, "vec_id", "embedding", m = 8, k = 16)
        val enc = encoded.persist()
        enc.count()
        val build = (System.nanoTime() - t0) / 1e9
        val out = cell(name, build, qv => Similarity.pqTopK(enc, codebooks,
          qv, "vec_id", "embedding", k = k, rerank = 400))
        enc.unpersist()
        out
      }

      val out = Seq(
        f""""exact":{"query_s":$exactS%.4f,"recall":1.000,"speedup":1.00,"index_s":0.00}""",
        cell("lsh", 0.0, lsh(4)),
        cell(s"lsh_scaled_b$nbitsScaled", 0.0, lsh(nbitsScaled)),
        lshIndexedCell("lsh_indexed_b4", 4),
        lshIndexedCell(s"lsh_indexed_b$nbitsScaled", nbitsScaled),
        ivfCell("ivf", 16, 8),
        ivfCell(s"ivf_scaled_l$nlistScaled", nlistScaled,
          math.max(8, nlistScaled / 8)),
        pqCell("pq"))
      embs.unpersist()
      Seq(s""""x$factor":{"n_vectors":$n,${out.mkString(",")}}""")
    }

    val all = factors.flatMap(cells)
    println(s"""{"metric":"ann_crossover","reps":$reps,"k":$k,""" +
      s""""n_queries":$nQueries,"scales":{${all.mkString(",")}}}""")
    spark.stop()
  }
}
