package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Mergeable frequency-sketch operators for heavy-hitter mining.
  *
  * At corpus scale the interesting "frequent item" domains are
  * combinatorial — word n-grams, URL paths, shingles — where a plain
  * `groupBy().count()` shuffles one record per distinct item per map
  * partition; over 100 TB of 3-grams that exchange is the job. The
  * Misra–Gries summary (Misra & Gries 1982; mergeable per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) caps each partition's contribution at
  * `k` candidate rows while GUARANTEEING that every item with global
  * frequency > n/(k+1) survives in at least one partition's summary
  * (if an item is nowhere locally heavy, its global count is at most
  * Σ_p n_p/(k+1) = n/(k+1)). A threshold query `count·denom ≥ n` with
  * `denom ≤ k` can therefore run as sketch → tiny exact-verify pass over
  * the candidate set only, and still be EXACT — which is what the DuckDB
  * oracle checks for the declared `heavy_hitters` query.
  *
  * The reference has no sketch surface (its only aggregates are min/max/
  * count, SURVEY.md §2.4); this is the capability-layer tier alongside
  * `agg_approx_distinct` (HLL) and `agg_quantiles_approx` (KLL), but
  * unlike those two the composition here is exact end-to-end.
  */
object Sketch {

  /** Classic Misra–Gries update loop over one partition's items; returns
    * the surviving candidate keys (at most `k`). The decrement-all branch
    * charges one occurrence of the incoming item against all `k` counters
    * at once — that is the source of the n/(k+1) survival guarantee.
    */
  private def mgPartition(it: Iterator[String], k: Int): Iterator[String] = {
    val m = new java.util.HashMap[String, Long](k * 2)
    while (it.hasNext) {
      val w = it.next()
      val cur = m.getOrDefault(w, 0L)
      if (cur > 0L) m.put(w, cur + 1L)
      else if (m.size < k) m.put(w, 1L)
      else {
        val entries = m.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          if (e.getValue == 1L) entries.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    // copy out: the map must not be mutated while Spark drains the iterator
    m.keySet().asScala.toVector.iterator
  }

  /** Per-partition MG candidate union: ≤ k rows per input partition, so
    * the exchange after this is bounded by partitions·k regardless of the
    * input's distinct-item cardinality. `mapPartitions` is the right tool
    * here (per-partition imperative state with data-dependent eviction —
    * not expressible as a Catalyst aggregate without losing the bound).
    */
  def mgCandidates(items: Dataset[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import items.sparkSession.implicits._
    items.mapPartitions(it => mgPartition(it, k)).toDF("item").distinct()
  }

  /** Exact heavy hitters, sketch-accelerated: all items whose count
    * satisfies `count * denom >= n` (share ≥ 1/denom), computed as
    * MG-candidates → broadcast semi-join → exact count over candidates
    * only. `denom <= k` makes the candidate set a guaranteed superset
    * (threshold n/denom ≥ n/k > n/(k+1)), so the result equals the plain
    * `GROUP BY ... HAVING` answer while the exchange stays bounded by the
    * candidate set, not the item vocabulary. The items source is scanned
    * twice (both scans narrow); at cluster scale persist the exploded
    * items if the explode itself is expensive.
    */
  def heavyHitters(items: Dataset[String], k: Int, denom: Long): DataFrame = {
    require(denom > 0 && denom <= k,
      s"superset guarantee needs 0 < denom <= k, got denom=$denom k=$k")
    val cand = mgCandidates(items, k)
    val toks = items.toDF("item")
    val tot = toks.agg(count(lit(1)).as("__n"))
    toks.join(broadcast(cand), "item")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .where(col("cnt") * lit(denom) >= col("__n"))
      .select(col("item"), col("cnt"),
        (col("cnt").cast("double") / col("__n").cast("double")).as("share"))
  }
}
