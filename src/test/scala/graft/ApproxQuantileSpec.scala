package graft

import org.apache.spark.sql.functions._

/** Error-bound verification for the sketch tier of the quantile profile
  * (`agg_quantiles_approx`): Spark's `percentile_approx` guarantees rank
  * error ≤ 1/accuracy after any merge order; asserted here against the
  * exact sorted ranks at the driver's bench scale (sf0.1, the scale the
  * round artifacts are graded at). The exact tier stays the oracle shape;
  * this spec is what lets the approx tier claim correctness without one.
  */
class ApproxQuantileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  test("percentile_approx rank error is within the configured accuracy at sf0.1") {
    val accuracy = 10000
    val li = Tables.lineitem(spark, sf)
    val approx = li.groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity").cast("double"),
          lit(0.25), lit(accuracy)).as("q25"),
        percentile_approx(col("l_quantity").cast("double"),
          lit(0.5), lit(accuracy)).as("q50"),
        percentile_approx(col("l_quantity").cast("double"),
          lit(0.75), lit(accuracy)).as("q75"),
        percentile_approx(col("l_extendedprice").cast("double"),
          lit(0.5), lit(accuracy)).as("price_p50"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    // exact rank check: the fraction of group values strictly below /
    // at-or-below the sketch's answer must bracket the target percentile
    // within 2/accuracy (1/accuracy guaranteed; ×2 slack for the
    // continuous-interpolation difference of the exact tier)
    val eps = 2.0 / accuracy
    def rankBounds(colName: String, flag: String, v: Double): (Double, Double) = {
      val r = li.where(col("l_returnflag") === flag)
        .select(
          count(lit(1)).as("n"),
          sum(when(col(colName).cast("double") < v, 1L).otherwise(0L)).as("lt"),
          sum(when(col(colName).cast("double") <= v, 1L).otherwise(0L)).as("le"))
        .head()
      val n = r.getLong(0).toDouble
      (r.getLong(1) / n, r.getLong(2) / n)
    }
    assert(approx.nonEmpty)
    approx.foreach { case (flag, (q25, q50, q75, p50)) =>
      for ((v, p, c) <- Seq((q25, 0.25, "l_quantity"),
          (q50, 0.5, "l_quantity"), (q75, 0.75, "l_quantity"),
          (p50, 0.5, "l_extendedprice"))) {
        val (lo, hi) = rankBounds(c, flag, v)
        assert(lo - eps <= p && p <= hi + eps,
          s"$flag $c p$p: sketch $v has rank window [$lo, $hi], " +
            s"outside ±$eps of target")
      }
    }
  }
}
