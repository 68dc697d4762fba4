package graft

import org.apache.spark.sql.functions._

/** Error-bound verification for the sketch tier of the distinct profile
  * (`agg_approx_distinct`): HyperLogLog++ with rsd 0.01 against the exact
  * per-group distinct counts at the driver's bench scale (sf0.1). Same
  * contract shape as ApproxQuantileSpec — the exact tier (`agg_distinct`)
  * stays the oracle form; this spec is what lets the sketch tier claim
  * correctness without one.
  */
class ApproxDistinctSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  test("approx_count_distinct is within 5x rsd of exact per group at sf0.1") {
    val ev = Tables.events(spark, sf)
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    // rsd is the sketch's standard deviation; 5 sigma over a handful of
    // groups is a no-flake bound (the sketch is deterministic for a given
    // input set, so this is really a fixed-input regression gate)
    exact.foreach { case (k, e) =>
      val rel = math.abs(approx(k) - e).toDouble / e
      assert(rel <= 0.05, s"group $k: approx ${approx(k)} vs exact $e (rel $rel)")
    }
  }
}
