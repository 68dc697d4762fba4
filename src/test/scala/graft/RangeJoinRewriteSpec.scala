package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{RangeJoin, RangeJoinRewrite}

/** The interval-containment rewrite: `p >= lo && p <= hi` joins must
  * produce the nested-loop plan's exact multiset of rows from a banded
  * equi-join plan.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Points (with duplicates, negatives and a null) × intervals (short,
    * long, inverted, null-bounded) — every edge the rewrite must keep
    * bit-compatible with the nested-loop form.
    */
  private def corpus(): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(13)
    val pts: Seq[java.lang.Long] =
      (0 until 300).map(_ => java.lang.Long.valueOf(rnd.nextLong() % 50000L)) ++
        Seq(java.lang.Long.valueOf(777L), java.lang.Long.valueOf(777L),
          null.asInstanceOf[java.lang.Long])
    val points = (pts.zipWithIndex
      .map { case (p, i) => (i.toLong, p) } ++
      // two literal duplicate ROWS: multiset semantics must multiply them
      Seq((500L, java.lang.Long.valueOf(777L)),
        (500L, java.lang.Long.valueOf(777L)))).toDF("pid", "p")
    val ivs: Seq[(Long, java.lang.Long, java.lang.Long)] =
      (0 until 80).map { i =>
        val lo = rnd.nextLong() % 50000L
        (i.toLong, java.lang.Long.valueOf(lo),
          java.lang.Long.valueOf(lo + rnd.nextInt(5000)))
      } ++ Seq(
        (900L, java.lang.Long.valueOf(700L), java.lang.Long.valueOf(800L)),
        (901L, java.lang.Long.valueOf(100L), java.lang.Long.valueOf(-100L)), // inverted
        (902L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)),
        (903L, java.lang.Long.valueOf(-40000L), java.lang.Long.valueOf(40000L))) // long span
    val ranges = ivs.toDF("rid", "lo", "hi")
    (points, ranges)
  }

  private def withRule[T](f: => T): T = OptimizerLock.synchronized {
    val saved = spark.experimental.extraOptimizations
    RangeJoin.install(spark)
    try f finally spark.experimental.extraOptimizations = saved
  }

  /** Baselines need the rules ABSENT — other suites run the declared
    * join_hamming/join_interval queries, whose lambdas install the
    * rewrites on the shared session for good.
    */
  private def withoutRules[T](f: => T): T = OptimizerLock.synchronized {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(r =>
      (r eq RangeJoinRewrite) || (r eq graft.plans.SimJoinRewrite))
    try f finally spark.experimental.extraOptimizations = saved
  }

  private def key(r: org.apache.spark.sql.Row): (Long, Long) =
    (r.getLong(0), r.getLong(1))

  test("rewritten range join: exact multiset parity with the nested-loop plan") {
    val (points, ranges) = corpus()
    def q(): DataFrame =
      points.join(ranges, $"p" >= $"lo" && $"p" <= $"hi")
        .select($"pid", $"rid")
    val (naivePlan, naive) = withoutRules {
      (q().queryExecution.executedPlan.toString,
        q().collect().map(key).groupBy(identity).view
          .mapValues(_.length).toMap)
    }
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
    assert(naive.nonEmpty)
    assert(naive.exists(_._2 > 1), "duplicate points must multiply")
    val (rewritten, plan) = withRule {
      val df = q()
      (df.collect().map(key).groupBy(identity).view.mapValues(_.length).toMap,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rewritten plan still nested-loop:\n$plan")
    assert(rewritten == naive)
  }

  test("bin width conf is honored and does not change results") {
    val (points, ranges) = corpus()
    def run(): Map[(Long, Long), Int] = withRule {
      points.join(ranges, $"lo" <= $"p" && $"hi" >= $"p") // flipped forms
        .select($"pid", $"rid")
        .collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    }
    val atDefault = run()
    spark.conf.set("spark.graft.rangeJoin.binWidth", "64")
    val at64 = try run()
    finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    assert(atDefault == at64)
    assert(atDefault.nonEmpty)
  }

  test("guards: equi-keyed, non-integral, straddling, one-sided are untouched") {
    withoutRules {
    val (points, ranges) = corpus()
    def optimized(df: DataFrame) = df.queryExecution.optimizedPlan
    val equi = points.join(ranges,
      $"pid" === $"rid" && $"p" >= $"lo" && $"p" <= $"hi")
    assert(RangeJoinRewrite(optimized(equi)) eq optimized(equi))
    val dbl = points.withColumn("pd", $"p".cast("double")).join(
      ranges.withColumn("lod", $"lo".cast("double"))
        .withColumn("hid", $"hi".cast("double")),
      $"pd" >= $"lod" && $"pd" <= $"hid")
    assert(RangeJoinRewrite(optimized(dbl)) eq optimized(dbl))
    // bounds split across both sides: not an interval containment
    val straddle = points.join(ranges, $"p" >= $"lo" && $"p" <= $"pid" + 100L)
    assert(RangeJoinRewrite(optimized(straddle)) eq optimized(straddle))
    // only a lower bound: a half-open scan, not a containment join
    val half = points.join(ranges, $"p" >= $"lo")
    assert(RangeJoinRewrite(optimized(half)) eq optimized(half))
    val pos = points.join(ranges, $"p" >= $"lo" && $"p" <= $"hi")
    assert(!(RangeJoinRewrite(optimized(pos)) eq optimized(pos)))
    }
  }

  test("inverted bounds generate zero bin rows, not a descending range") {
    // lo > hi is an unsatisfiable containment: the rewrite's explicit
    // step-1 sequence must emit NOTHING (Sequence's default would step -1
    // and materialize a descending bin array — for a pathological
    // inversion, a huge one)
    val points = (0 until 50).map(i => (i.toLong, i.toLong)).toDF("pid", "p")
    val ranges = Seq((0L, 1000000L, -1000000L)).toDF("rid", "lo", "hi")
    val out = withRule {
      val df = points.join(ranges, $"p" >= $"lo" && $"p" <= $"hi")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"not rewritten:\n$plan")
      df.count()
    }
    assert(out == 0L)
  }

  test("constant bounds are pushed below the join, never exploded") {
    withoutRules {
      val points = (0 until 10).map(i => (i.toLong, i.toLong)).toDF("pid", "p")
      val ranges = Seq((0L, 1L)).toDF("rid", "x")
      def optimized(df: DataFrame) = df.queryExecution.optimizedPlan
      // a literal whole-domain interval (the sentinel hazard) never
      // reaches the rule as a containment: Catalyst pushes foldable
      // conjuncts below the join first, leaving a condition-less cross
      // join the rule ignores — so no bin explosion is even possible
      val wide = points.join(ranges,
        $"p" >= lit(0L) && $"p" <= lit(Long.MaxValue - 1))
      assert(RangeJoinRewrite(optimized(wide)) eq optimized(wide),
        "constant-bound join must be left untouched")
    }
  }

  test("overlap join: exact multiset parity with the nested loop") {
    // intervals with duplicates, inversions and nulls on BOTH sides — the
    // canonical-bin device must keep each qualifying pair exactly once
    val rnd = new scala.util.Random(29)
    def mkIvs(n: Int, tag: Long): Seq[(Long, java.lang.Long, java.lang.Long)] =
      (0 until n).map { i =>
        val lo = rnd.nextLong() % 20000L
        (tag * 10000 + i, java.lang.Long.valueOf(lo),
          java.lang.Long.valueOf(lo + rnd.nextInt(3000) - 500)) // some inverted
      } ++ Seq(
        (tag * 10000 + 9000, java.lang.Long.valueOf(100L),
          java.lang.Long.valueOf(-5000L)), // deeply inverted
        (tag * 10000 + 9001, null.asInstanceOf[java.lang.Long],
          java.lang.Long.valueOf(50L)),
        (tag * 10000 + 9002, java.lang.Long.valueOf(0L),
          java.lang.Long.valueOf(0L)))
    val a = mkIvs(120, 1L).toDF("aid", "alo", "ahi")
    val bt = mkIvs(90, 2L).toDF("bid", "blo", "bhi")
    def q(): DataFrame =
      a.join(bt, $"alo" <= $"bhi" && $"blo" <= $"ahi").select($"aid", $"bid")
    val naive = withoutRules {
      q().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    }
    assert(naive.nonEmpty)
    val (rewritten, plan) = withRule {
      val df = q()
      (df.collect().map(key).groupBy(identity).view.mapValues(_.length).toMap,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join still nested-loop:\n$plan")
    assert(rewritten == naive)
    // strict and flipped orientations too
    def q2(): DataFrame =
      a.join(bt, $"bhi" >= $"alo" && $"ahi" > $"blo" - 1L)
        .select($"aid", $"bid")
    val naive2 = withoutRules {
      q2().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    }
    val got2 = withRule {
      q2().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    }
    assert(got2 == naive2)
  }

  test("per-join range_join hint: two joins in one session each bin at their own width") {
    // the conf dial can only size EVERY range join identically; the hint
    // (consumed by RangeJoinHint before the analyzer drops unknown hints
    // — GraftExtensions sessions only) sizes each join independently
    OptimizerLock.synchronized {
      val saved = spark
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      try {
        val s2 = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .withExtensions(new graft.plans.GraftExtensions())
          .getOrCreate()
        assert(s2 ne saved)
        import s2.implicits._
        // two DIFFERENT interval scales: short spans (~40) and long
        // spans (~30000) — one conf width cannot fit both
        val pts = (0 until 400).map(i => (i.toLong, i * 37L % 9000L))
          .toDF("pid", "p")
        val shortIvs = (0 until 60).map(i => (i.toLong, i * 150L, i * 150L + 40L))
          .toDF("rid", "lo", "hi")
        val longIvs = (0 until 40)
          .map(i => (i.toLong, i * 900L, i * 900L + 30000L))
          .toDF("rid", "lo", "hi")
        def naive(ivs: org.apache.spark.sql.DataFrame) = pts
          .join(ivs.withColumnRenamed("lo", "l").withColumnRenamed("hi", "h"),
            $"p" >= $"l" && $"p" <= $"h")
          .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(identity).view.mapValues(_.length).toMap
        // hint on the interval side — the common "size to THIS dim" shape
        val q1 = pts.join(shortIvs.hint("range_join", 50),
          $"p" >= $"lo" && $"p" <= $"hi").select($"pid", $"rid")
        // hint on the join output — the other placement the rule accepts
        val q2 = pts.join(longIvs, $"p" >= $"lo" && $"p" <= $"hi")
          .hint("range_join", 20000).select($"pid", $"rid")
        val p1 = q1.queryExecution.optimizedPlan.toString
        val p2 = q2.queryExecution.optimizedPlan.toString
        assert(p1.contains(" 50)") && !p1.contains(" 1000)"),
          s"q1 not binned at its hinted width 50:\n$p1")
        assert(p2.contains(" 20000)") && !p2.contains(" 1000)"),
          s"q2 not binned at its hinted width 20000:\n$p2")
        // no nested loop in either physical plan
        Seq(q1, q2).foreach { q =>
          val phys = q.queryExecution.executedPlan.toString
          assert(!phys.contains("BroadcastNestedLoopJoin") &&
            !phys.contains("CartesianProduct"), s"still nested-loop:\n$phys")
        }
        // and the hinted plans stay EXACT vs the nested loop
        def multiset(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(identity).view.mapValues(_.length).toMap
        assert(multiset(q1) == naive(shortIvs))
        assert(multiset(q2) == naive(longIvs))
        // both widths live in ONE composed query too (union of the joins)
        val both = q1.union(q2).queryExecution.optimizedPlan.toString
        assert(both.contains(" 50)") && both.contains(" 20000)"),
          s"composed query lost a per-join width:\n$both")
        // the pure-SQL hint form works on the same session
        pts.createOrReplaceTempView("__rj_pts")
        shortIvs.createOrReplaceTempView("__rj_ivs")
        val sqlQ = s2.sql("SELECT /*+ range_join(64) */ pid, rid " +
          "FROM __rj_pts JOIN __rj_ivs ON p >= lo AND p <= hi")
        val sqlPlan = sqlQ.queryExecution.optimizedPlan.toString
        assert(sqlPlan.contains(" 64)") && !sqlPlan.contains(" 1000)"),
          s"SQL hint not honored:\n$sqlPlan")
        assert(multiset(sqlQ) == naive(shortIvs))
      } finally {
        org.apache.spark.sql.SparkSession.setDefaultSession(saved)
        org.apache.spark.sql.SparkSession.setActiveSession(saved)
      }
    }
  }

  test("range_join hint on a session WITHOUT the analyzer rule degrades to the conf dial") {
    // session-local installs (experimental.extraOptimizations) cannot add
    // analyzer rules: the hint is dropped with Spark's standard warning
    // and the rewrite sizes from the conf — results stay exact either way
    val pts = (0 until 100).map(i => (i.toLong, i * 11L)).toDF("pid", "p")
    val ivs = (0 until 20).map(i => (i.toLong, i * 50L, i * 50L + 30L))
      .toDF("rid", "lo", "hi")
    def q(): DataFrame = pts.join(ivs.hint("range_join", 64),
      $"p" >= $"lo" && $"p" <= $"hi").select($"pid", $"rid")
    val naive = withoutRules {
      q().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    }
    val (got, plan) = withRule {
      (q().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap,
        q().queryExecution.optimizedPlan.toString)
    }
    assert(got == naive)
    assert(plan.contains(" 1000)"), // the conf default, not the hint
      s"expected the conf fallback width in:\n$plan")
  }

  test("mixed-type overlap-shaped condition stays executable (not a broken rewrite)") {
    // `a.ts <= b.ts && b.id <= a.id` with ts:long and id:int matches the
    // overlap SHAPE but pairs bounds of different types — without the
    // cross-conjunct type gate the rule built Least/Greatest over
    // mixed-type children (unresolved mid-optimizer) and a query that
    // previously ran as a nested loop started FAILING at planning. The
    // rewrite must either skip or stay correct; it must never brick.
    val a = Seq((1L, 10), (5L, 3), (9L, 7)).toDF("ats", "aid")
    val bt = Seq((2L, 4), (7L, 8), (0L, 1)).toDF("bts", "bid")
    def q(): DataFrame =
      a.join(bt, $"ats" <= $"bts" && $"bid" <= $"aid")
        .select($"ats", $"aid", $"bts", $"bid")
    val naive = withoutRules {
      q().collect().map(_.toString).sorted.toSeq
    }
    val got = withRule { q().collect().map(_.toString).sorted.toSeq }
    assert(got == naive)
    // same-type unrelated column pairs may still be treated as one
    // phantom interval — the rewrite stays CORRECT regardless (original
    // predicate rides along; normalization covers inversions)
    val a2 = Seq((1L, 10L), (5L, 3L), (9L, 7L)).toDF("ats", "aid")
    val b2 = Seq((2L, 4L), (7L, 8L), (0L, 1L)).toDF("bts", "bid")
    def q2(): DataFrame =
      a2.join(b2, $"ats" <= $"bts" && $"bid" <= $"aid")
        .select($"ats", $"aid", $"bts", $"bid")
    val naive2 = withoutRules { q2().collect().map(_.toString).sorted.toSeq }
    val got2 = withRule { q2().collect().map(_.toString).sorted.toSeq }
    assert(got2 == naive2)
  }

  test("fuzz: random interval-interval overlaps match the nested loop") {
    val rnd = new scala.util.Random(71)
    for (round <- 0 until 4) {
      val width = Seq("1", "7", "100", "4096")(round)
      def side(n: Int, span: Int): Seq[(Long, java.lang.Long, java.lang.Long)] =
        (0 until n).map { i =>
          val lo = rnd.nextLong() % 5000L
          (i.toLong,
            if (rnd.nextInt(20) == 0) null.asInstanceOf[java.lang.Long]
            else java.lang.Long.valueOf(lo),
            java.lang.Long.valueOf(lo + rnd.nextInt(span) - span / 4))
        }
      val a = side(40 + rnd.nextInt(60), 400).toDF("aid", "alo", "ahi")
      val bt = side(30 + rnd.nextInt(50), 900).toDF("bid", "blo", "bhi")
      def q(): DataFrame =
        a.join(bt, $"alo" <= $"bhi" && $"blo" <= $"ahi")
          .select($"aid", $"bid")
      val naive = withoutRules {
        q().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
      }
      spark.conf.set("spark.graft.rangeJoin.binWidth", width)
      val got = try withRule {
        q().collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
      } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
      assert(got == naive, s"round $round width $width")
    }
  }

  test("fuzz: random points/intervals/widths match the nested loop") {
    val rnd = new scala.util.Random(53)
    for (round <- 0 until 5) {
      val pts = (0 until 50 + rnd.nextInt(100))
        .map(i => (i.toLong, rnd.nextLong() % 2000L)).toDF("pid", "p")
      val ivs = (0 until 20 + rnd.nextInt(40)).map { i =>
        val lo = rnd.nextLong() % 2000L
        (i.toLong, lo, lo + rnd.nextInt(300).toLong)
      }.toDF("rid", "lo", "hi")
      val strict = rnd.nextBoolean()
      def q() = {
        val cond =
          if (strict) $"p" > $"lo" && $"p" < $"hi"
          else $"p" >= $"lo" && $"p" <= $"hi"
        pts.join(ivs, cond).select($"pid", $"rid")
      }
      val naive = withoutRules { q().collect().map(key).sorted.toSeq }
      val width = Seq("7", "64", "500")(rnd.nextInt(3))
      val (out, plan) = withRule {
        spark.conf.set("spark.graft.rangeJoin.binWidth", width)
        try (q().collect().map(key).sorted.toSeq,
          q().queryExecution.executedPlan.toString)
        finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
      }
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"round $round not rewritten")
      assert(out == naive,
        s"round $round: strict=$strict width=$width mismatch")
    }
  }

  test("extra conjuncts survive the rewrite") {
    val (points, ranges) = corpus()
    def q(): DataFrame =
      points.join(ranges,
        $"p" >= $"lo" && $"p" <= $"hi" && $"pid" % 2 === $"rid" % 2)
        .select($"pid", $"rid")
    val naive = withoutRules { q().collect().map(key).sorted.toSeq }
    val rewritten = withRule { q().collect().map(key).sorted.toSeq }
    assert(rewritten == naive)
  }
}
