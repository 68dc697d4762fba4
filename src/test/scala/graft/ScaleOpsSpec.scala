package graft

import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is result-identical to the plain join") {
    // heavy skew: 90% of fact rows share one key
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 0L, s"v$i")).toDF("k", "payload")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "attr").collect()
      .map(_.toSeq).sortBy(_.toString)
    val salted = ScaleOps.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "payload", "attr").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted join spreads a hot key over multiple salts") {
    val fact = (1 to 1000).map(i => (0L, s"v$i")).toDF("k", "payload")
    val salts = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)))
      .select(countDistinct("__salt")).as[Long].head()
    assert(salts == 8L)
  }

  test("bloom-pruned join is result-identical and actually prunes") {
    val fact = (1L to 5000L).map(i => (i % 100, s"v$i")).toDF("k", "payload")
    val dim = Seq((7L, "a"), (13L, "b"), (42L, "c")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "attr").collect().map(_.toSeq).sortBy(_.toString)
    val pruned = ScaleOps.bloomPrunedJoin(fact, dim, "k", expectedDimKeys = 100L)
      .select("k", "payload", "attr").collect().map(_.toSeq).sortBy(_.toString)
    assert(pruned.sameElements(plain) && plain.length == 150)
    // the pre-join filter itself sheds most of the fact side (false
    // positives allowed, false negatives not: ≥ matched, well under total)
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    val bloom = dim.select(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(dim("k"))), 100L).toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
    val kept = fact.where(Bridge.column(new BloomFilterMightContain(
        Literal(bloom, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(xxhash64(fact("k")))))).count()
    assert(kept >= 150 && kept < 1000, s"bloom kept $kept of 5000")
  }

  test("bloom-pruned join pins a nondeterministic dim before double-eval") {
    val fact = (1L to 500L).map(i => (i % 50, s"v$i")).toDF("k", "payload")
    val dimDet = Seq((7L, "a"), (13L, "b")).toDF("k", "attr")
    val dimRand = dimDet.where(rand() >= 0.0) // always-true but nondeterministic
    // deterministic dim: no checkpoint (plan still reads the local relation)
    val plannedDet = ScaleOps.bloomPrunedJoin(fact, dimDet, "k")
    assert(!plannedDet.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "deterministic dim should not be checkpointed")
    // nondeterministic dim: pinned to a snapshot (LogicalRDD), and since
    // the predicate is always-true the result still equals the plain join
    val plannedRand = ScaleOps.bloomPrunedJoin(fact, dimRand, "k")
    assert(plannedRand.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "nondeterministic dim must be localCheckpoint-pinned")
    val plain = fact.join(dimDet, Seq("k"))
      .select("k", "payload", "attr").collect().map(_.toSeq).sortBy(_.toString)
    val got = plannedRand
      .select("k", "payload", "attr").collect().map(_.toSeq).sortBy(_.toString)
    assert(got.sameElements(plain))
  }

  test("bloom-pruned join with an empty dim yields an empty result") {
    val fact = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "payload")
    val dim = Seq.empty[(Long, String)].toDF("k", "attr")
    assert(ScaleOps.bloomPrunedJoin(fact, dim, "k").isEmpty)
  }

  test("approx distinct tracks exact within rsd bounds") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = ScaleOps.approxDistinct(df, "l_returnflag", "l_partkey")
      .join(df.groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("exact_nd")), "l_returnflag")
      .select("l_returnflag", "approx_nd", "exact_nd").collect()
    r.foreach { row =>
      val approx = row.getLong(1).toDouble
      val exact = row.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.15,
        s"${row.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("bucketed tables join without an exchange") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    ScaleOps.writeBucketed(li, "li_b", "l_orderkey", 8)
    ScaleOps.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", "l_orderkey", 8)
    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
