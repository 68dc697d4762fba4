package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Capability layer (SURVEY.md §2.3-J3/§2.4-A4/§2.5-W6/§2.6/§7.4): the full
  * relational surface the reference externalizes to its stores, exposed as
  * Spark built-ins over the TPC-H-ish tables.
  *
  * Determinism discipline for the DuckDB oracle:
  *  - double sums go through exact DECIMAL accumulation (per-row products are
  *    single IEEE ops, bit-identical across engines; the decimal cast of an
  *    identical double is identical; decimal addition is associative), then
  *    cast back to DOUBLE for a stable output schema;
  *  - counts are BIGINT on both sides (DuckDB sum(int) would be HUGEINT);
  *  - every query ends in a total-order ORDER BY over non-null keys.
  *
  * Scale notes inline: dimension sides of joins are `broadcast()`;
  * aggregations rely on partial (map-side) aggregation; top-k uses
  * TakeOrderedAndProject, never a full sort.
  */
object CapabilityQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hash join: fact(orders) ⋈ broadcast dim(customer) + group agg
    "join_hash" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(38,2)")).cast("double")
            .as("total_price"))
        .orderBy("c_mktsegment")
    },
    // semi + anti join, tagged union (anti side may be empty — tag keeps
    // the result shape stable either way)
    "join_semi_anti" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("with_orders"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("no_orders"))
      semi.unionByName(anti).select("tag", "c_mktsegment", "n")
        .orderBy("tag", "c_mktsegment")
    },
    // full outer join with null-side handling
    "join_outer" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val perCust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      c.join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_name"), lit("<no-customer>")).as("name"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("custkey")
    },
    // equi + range (non-equi on timestamps) join
    "join_range" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late"))
        .orderBy("o_orderpriority")
    },
    // DECLARATIVE similarity join: the user writes the quadratic
    // `bit_count(fp_a ^ fp_b) <= 4` predicate; the Catalyst rewrite
    // (graft.plans.SimJoinRewrite, installed via extraOptimizations)
    // turns the nested-loop plan into a pigeonhole-banded equi-join with
    // identical output — which is why this query can run the same SQL
    // quadratically in DuckDB and still hash-match. Fingerprints are a
    // deterministic arithmetic mix of doc_id/n_chars so the oracle can
    // build the very same 64-bit values: a 21-bit pattern (10-bit group,
    // 3-bit doc low bits, 3-bit length class) tiled into three DISJOINT
    // copies across the word — every band carries signal (an fp that
    // leaves high bands constant-zero makes those bands degenerate
    // buckets, the exact skew the hand-built tiers cap), and two fps sit
    // within Hamming 4 iff their patterns differ in ≤ 1 bit.
    "join_hamming" -> { (s, d) =>
      graft.plans.SimJoin.install(s)
      val x = shiftleft(pmod(shiftright(col("doc_id"), 3), lit(1024L)), 11) +
        col("doc_id").bitwiseAND(lit(7L)) +
        shiftleft(pmod(col("n_chars"), lit(8L)), 5)
      val fp = x.bitwiseXOR(shiftleft(x, 21)).bitwiseXOR(shiftleft(x, 42))
        .as("fp")
      val docs = Tables.documents(s, d).select(col("doc_id"), fp)
      val a = docs.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
      a.join(b,
          graft.plans.SimJoin.hamming64(col("fp_a"), col("fp_b")) <= 4 &&
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.plans.SimJoin.hamming64(col("fp_a"), col("fp_b"))
            .as("hamming"))
        .orderBy("id_a", "id_b")
    },
    // DECLARATIVE interval-containment join: the user writes the plain
    // `point >= lo AND point <= hi` predicate (no equi key — Spark's
    // nested-loop trap); graft.plans.RangeJoinRewrite bins the domain and
    // turns it into an equi-join on floor(point/B), re-applying the exact
    // original predicate. DuckDB executes the same SQL through its own
    // IEJoin — two independent physical strategies, one hash-matched
    // result. The synthetic domain (1M values, spans ≤ 48) is sized to
    // the DEFAULT bin width — ~1000 bins of join parallelism with 1–2
    // bins per interval, the shape the rewrite's docstring prescribes —
    // so no session conf is touched (an earlier width-16 session set
    // leaked into later queries; see ADVICE r6)
    "join_interval" -> { (s, d) =>
      graft.plans.RangeJoin.install(s)
      val ev = Tables.events(s, d).select(col("event_id"),
        (col("event_id") * 131 % 1000000).as("p"))
      val iv = Tables.orders(s, d).select(col("o_orderkey"),
        (col("o_orderkey") * 700 % 1000000).as("lo"),
        (col("o_orderkey") * 700 % 1000000 + (col("o_orderkey") % 5) * 12)
          .as("hi"))
      ev.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("min_eid"), max("event_id").as("max_eid"))
        .orderBy("o_orderkey")
    },
    // DECLARATIVE interval-OVERLAP join (the other classic pipeline
    // shape: time-range × time-range): the plain `aLo <= bHi AND
    // bLo <= aHi` predicate has no equi key, so stock Spark nested-loops
    // it; RangeJoinRewrite explodes BOTH sides to covered bins and keeps
    // each pair only in its canonical shared bin (greatest of the two
    // first-bins) — exactly-once with no distinct. DuckDB executes the
    // identical SQL through IEJoin: two independent physical strategies,
    // one hash-matched result. Domain sized to the default bin width,
    // like join_interval — no session conf touched
    "join_overlap" -> { (s, d) =>
      graft.plans.RangeJoin.install(s)
      val a = Tables.orders(s, d).select(col("o_orderkey"),
        (col("o_orderkey") * 700 % 1000000).as("alo"),
        (col("o_orderkey") * 700 % 1000000 + (col("o_orderkey") % 5) * 12)
          .as("ahi"))
      val b = Tables.part(s, d).select(col("p_partkey"),
        (col("p_partkey") * 1100 % 1000000).as("blo"),
        (col("p_partkey") * 1100 % 1000000 + (col("p_partkey") % 7) * 16)
          .as("bhi"))
      a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n_overlaps"),
          min("o_orderkey").as("min_ord"), max("o_orderkey").as("max_ord"))
        .orderBy("p_partkey")
    },
    // TPC-H Q1 shape: multi-measure grouped agg with derived expressions
    "agg_group" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      // decimal-FIRST arithmetic: only the raw 2-decimal inputs are cast
      // from double (their doubles sit ~1e-15 from the exact 2-decimal
      // value, never near a scale-2 rounding boundary); the products are
      // then EXACT decimal multiplications on both engines. Casting the
      // double PRODUCT instead (the old form) rounds at scale 6/8, where
      // Spark rounds the double's shortest decimal string but DuckDB
      // rounds its full binary expansion — at sf0.1 row counts some row
      // lands inside that half-ulp window and the sums diverge.
      val priceD = col("l_extendedprice").cast("decimal(12,2)")
      // inferred types: discPrice decimal(26,4); charge decimal(38,6) —
      // precision-adjusted down from 40, relying on Spark's precision-loss
      // scale floor (MINIMUM_ADJUSTED_SCALE = 6) staying ≥ the true scale
      // 6, so both products remain EXACT at these magnitudes
      val discPrice = priceD *
        (lit(1) - col("l_discount").cast("decimal(4,2)"))
      val charge = discPrice *
        (lit(1) + col("l_tax").cast("decimal(4,2)"))
      l.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(38,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(38,2)")).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          (sum(col("l_quantity").cast("decimal(38,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // distinct aggregation
    "agg_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("nd_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    // rollup with null group keys coalesced to a sentinel for stable sort
    "agg_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(38,2)")).cast("double")
          .as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")
    },
    // top-k per group via ranked window
    "window_rank" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    },
    // running sum over an explicit ROWS frame. (l_orderkey, l_linenumber)
    // is NOT unique in this data, so the order must be made total with the
    // full unique tuple — a ROWS frame over a tied order is nondeterministic.
    "window_running" -> { (s, d) =>
      val ord = Seq(col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_partkey"), col("l_suppkey"))
      val w = Window.partitionBy("l_orderkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wrn = Window.partitionBy("l_orderkey").orderBy(ord: _*)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          row_number().over(wrn).cast("long").as("rn"),
          col("l_linenumber"),
          sum(col("l_quantity").cast("decimal(38,2)")).over(w).cast("double")
            .as("run_qty"))
        .orderBy("l_orderkey", "rn")
    },
    // global top-k: TakeOrderedAndProject, not a full sort
    "sort_topk" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)
    },
    // distribution windows: ntile / percent_rank / cume_dist
    "window_dist" -> { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("c_mktsegment", "c_custkey")
    },
    // conditional scalar surface: CASE / nullif / ifnull / greatest / least
    "scalar_conditional" -> { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_orderkey") < 10000)   // pushed-down scope: the point
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",   // is operator
          "l_extendedprice", "l_partkey", "l_suppkey")         // coverage,
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          when(col("l_quantity") > 30, "bulk")
            .when(col("l_quantity") > 10, "mid")
            .otherwise("small").as("size_class"),
          expr("nullif(l_linestatus, 'O')").as("closed_status"),
          coalesce(expr("nullif(l_returnflag, 'N')"), lit("~")).as("rf_or"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
    },
    // multiset ops: UNION ALL / INTERSECT ALL / EXCEPT ALL keep duplicates
    "set_ops_all" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val c5 = Tables.customer(s, d).where(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      o.union(c5)                       // union = UNION ALL in Spark
        .intersectAll(o)
        .exceptAll(c5)
        .groupBy("k").agg(count(lit(1)).as("n")) // stable multiset compare
        .orderBy("k")
    },
    // deterministic train/val/test split: hash-based, reproducible across
    // runs/engines (the stable-split op of a training-data pipeline)
    "stable_split" -> { (s, d) =>
      val bucket = conv(substring(sha2(col("doc_id").cast("string"), 256),
        1, 2), 16, 10).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(bucket < 204, "train")     // 204/256 ≈ 80%
            .when(bucket < 230, "val")    //  26/256 ≈ 10%
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },
    // union ∘ intersect ∘ except pipeline over key sets
    "set_ops" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val ordered = o.select(col("o_custkey").as("k"))
      val highBal = c.where(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      val all = c.select(col("c_custkey").as("k"))
      val negBal = c.where(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      ordered.union(highBal).distinct()
        .intersect(all)
        .except(negBal)
        .orderBy("k")
    },
    // date/time scalar surface (year/month/trunc/diff)
    "scalar_datetime" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mon_start"),
          datediff(lit("1998-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_98"))
        .orderBy("o_orderkey")
    },
    // string + math scalar surface
    "scalar_string_math" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("br_up"),
          substring(col("p_name"), 1, 8).as("name8"),
          length(col("p_name")).cast("long").as("name_len"),
          round(col("p_retailprice"), 1).as("price_r1"),
          abs(col("p_size") - 25).cast("long").as("size_dist"),
          (col("p_size") % 7).cast("long").as("size_mod"),
          sqrt(col("p_retailprice")).as("price_sqrt"))
        .orderBy("p_partkey")
    },
    // as-of join: for each click, the latest purchase by the same user at
    // or before it. Spark lacks a native ASOF join operator — composed as
    // tagged-union + running `last(ignoreNulls)` window, which is the
    // single-shuffle formulation (one exchange on user_id, no row explosion;
    // DuckDB verifies with its native ASOF JOIN).
    "join_asof" -> { (s, d) =>
      val e = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val tagged = e.select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"),
        when(col("event_type") === "purchase", col("ts_us")).as("p_ts"),
        when(col("event_type") === "purchase", col("value")).as("p_val"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
        .withColumn("last_purchase_val", last(col("p_val"), ignoreNulls = true).over(w))
        .where(col("event_type") === "click" &&
          col("last_purchase_ts").isNotNull)
        .select("event_id", "user_id", "ts_us",
          "last_purchase_ts", "last_purchase_val")
        .orderBy("event_id")
    },
    // as-of with TOLERANCE (pandas merge_asof's gap bound): same
    // single-shuffle window formulation, then the match drops when the
    // latest purchase is older than 12 hours — semantically the ASOF
    // pick followed by a gap filter, which is exactly how DuckDB's
    // native ASOF JOIN verifies it
    "join_asof_tol" -> { (s, d) =>
      val tolUs = 43200000000L // 12 h in micros
      val e = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val tagged = e.select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"),
        when(col("event_type") === "purchase", col("ts_us")).as("p_ts"),
        when(col("event_type") === "purchase", col("value")).as("p_val"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_purchase_ts",
          last(col("p_ts"), ignoreNulls = true).over(w))
        .withColumn("last_purchase_val",
          last(col("p_val"), ignoreNulls = true).over(w))
        .where(col("event_type") === "click" &&
          col("last_purchase_ts").isNotNull &&
          col("ts_us") - col("last_purchase_ts") <= lit(tolUs))
        .select("event_id", "user_id", "ts_us",
          "last_purchase_ts", "last_purchase_val")
        .orderBy("event_id")
    },
    // generator / UDTF surface: positional explode of an array column
    "explode_array" -> { (s, d) =>
      val parts = split(concat_ws(",", col("event_type"),
        col("user_id").cast("string")), ",")
      Tables.events(s, d)
        .select(col("event_id"), posexplode(parts).as(Seq("pos", "val")))
        .select(col("event_id"), col("pos").cast("long").as("pos"), col("val"))
        .orderBy("event_id", "pos")
    },
    // pivot: one column per event type (explicit value list keeps the
    // schema static — no extra distinct-scan job at scale)
    "agg_pivot" -> { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(sum(col("value").cast("decimal(38,2)")).cast("double"))
        .na.fill(0.0, types)
        .orderBy("user_id")
    },
    // lag/lead/rank window surface (W6)
    "window_lag" -> { (s, d) =>
      val e = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      e.select(col("event_id"), col("user_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          rank().over(w).cast("long").as("rnk"))
        .orderBy("event_id")
    },
    // full cube over two dims
    "agg_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
        .orderBy("rf", "ls")
    },
    // explicit grouping sets — the general form rollup/cube specialize:
    // per-flag, per-status, and grand-total aggregates in ONE pass over
    // the fact table (Catalyst Expand), instead of three scans unioned
    "agg_grouping_sets" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(38,2)")).cast("double")
          .as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")
    },
    // ordered array / string aggregation (sort_array makes the per-group
    // collection order deterministic regardless of partitioning)
    "agg_collect" -> { (s, d) =>
      // arrays are CSV-serialized in the OUTPUT (the driver's pandas
      // compare can't hash ndarray cells) — the aggregation itself still
      // exercises collect_list/collect_set
      Tables.events(s, d)
        .where(col("user_id") < 5)
        .groupBy("user_id")
        .agg(
          concat_ws(",", sort_array(collect_list(col("event_id"))))
            .as("event_ids_csv"),
          concat_ws(",", sort_array(collect_set(col("event_type"))))
            .as("types_csv"))
        .orderBy("user_id")
    },
    // exact median (sort-based percentile — deterministic, unlike stddev
    // whose float accumulation is order-dependent)
    "agg_median" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("median_value"),
          min("value").as("min_value"), max("value").as("max_value"))
        .orderBy("event_type")
    },
    // exact multi-quantile profile per group (TPC-H-ish column stats pass;
    // Spark's sort-based percentile interpolates identically to DuckDB's
    // quantile_cont — verified bit-exact including float artifacts)
    "agg_quantiles" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity").cast("double"), lit(0.25)).as("q25"),
          percentile(col("l_quantity").cast("double"), lit(0.5)).as("q50"),
          percentile(col("l_quantity").cast("double"), lit(0.75)).as("q75"),
          percentile(col("l_extendedprice").cast("double"), lit(0.5))
            .as("price_p50"))
        .orderBy("l_returnflag")
    },
    // the 100 TB tier of agg_quantiles: one-pass mergeable KLL-style
    // sketch (Spark's percentile_approx) instead of a per-group sort —
    // map-side combinable, bounded memory at any cardinality. No SQL
    // oracle (sketch-dependent); rank error vs the exact tier is bounded
    // and asserted at sf0.1 in ApproxQuantileSpec
    "agg_quantiles_approx" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity").cast("double"),
            lit(0.25), lit(10000)).as("q25"),
          percentile_approx(col("l_quantity").cast("double"),
            lit(0.5), lit(10000)).as("q50"),
          percentile_approx(col("l_quantity").cast("double"),
            lit(0.75), lit(10000)).as("q75"),
          percentile_approx(col("l_extendedprice").cast("double"),
            lit(0.5), lit(10000)).as("price_p50"))
        .orderBy("l_returnflag")
    },
    // the 100 TB tier of agg_distinct: HyperLogLog++ (approx_count_
    // distinct) instead of an exact distinct — one map-side-combinable
    // sketch per group vs the exact form's two-shuffle distinct+count.
    // No SQL oracle (sketch-dependent); relative error vs the exact tier
    // is asserted at sf0.1 in ApproxDistinctSpec
    "agg_approx_distinct" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.01)
            .as("approx_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },
    // the sketch tiers' DRIVER-VISIBLE partial oracles: the estimates
    // themselves are engine-specific, but their ERROR CONTRACTS are not —
    // HLL++ at rsd=0.01 must land within 5% of the exact distinct count
    // (the oracle recomputes the exact side), and percentile_approx with
    // a 10k accuracy on a quartile must sit BETWEEN the exact adjacent
    // quantile ranks. A sketch gone wrong flips a boolean
    "agg_approx_distinct_check" -> { (s, d) =>
      // two-level aggregate, ONE shuffle: Spark's countDistinct forms an
      // expand + double exchange, but HLL is duplicate-insensitive, so
      // pre-distincting (type, user) serves BOTH the exact count (row
      // count of level 2) and an identical estimate
      Tables.events(s, d)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("__n"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.01).as("est"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            greatest(lit(1L), (col("exact_users") * 0.05).cast("long")))
            .as("ok_within_5pct"))
        .orderBy("event_type")
    },
    "agg_quantiles_approx_check" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity").cast("double"),
            lit(0.5), lit(10000)).as("est_p50"),
          expr("percentile(CAST(l_quantity AS DOUBLE), 0.45)").as("lo"),
          expr("percentile(CAST(l_quantity AS DOUBLE), 0.55)").as("hi"))
        .select(col("l_returnflag"),
          (col("est_p50") >= col("lo") && col("est_p50") <= col("hi"))
            .as("ok_p50_bracketed"))
        .orderBy("l_returnflag")
    },
    // sessionization: gap-based session windows per user (batch twin of
    // stream_session; Spark's session_window vs a gaps-and-islands oracle)
    "agg_session" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("tsc", timestamp_micros(expr("ts div 1000")))
        .groupBy(session_window(col("tsc"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(38,2)")).cast("double")
            .as("sum_value"))
        .select(unix_millis(col("session_window.start")).as("s_start_ms"),
          unix_millis(col("session_window.end")).as("s_end_ms"),
          col("user_id"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "s_start_ms")
    },
    // tumbling event-time window (batch twin of stream_tumbling;
    // the streaming form lives in graft.stream and is ScalaTest-verified)
    "agg_window_time" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("tsc", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tsc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(38,2)")).cast("double")
            .as("sum_value"))
        .select(unix_millis(col("window.start")).as("hour_ms"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_ms", "event_type")
    },
    // ordered funnel (signup → click → purchase): per-user earliest
    // completion per step, each strictly after the previous — one filtered
    // min-aggregate per step, all keyed on user_id (no windows, no
    // per-user event collection). Time is compared in integer µs on both
    // engines: DuckDB truncates parquet NANOS to µs, so a ns-precision
    // strict comparison could disagree across a sub-µs tie.
    "funnel_steps" -> { (s, d) =>
      import graft.ops.EventOps
      EventOps.funnel(
          Tables.events(s, d).withColumn("tsu", expr("ts div 1000")),
          "user_id", "tsu", "event_type",
          Seq("signup", "click", "purchase"))
        .select(col("user_id"),
          expr("t_1 div 1000").as("t1_ms"),
          expr("t_2 div 1000").as("t2_ms"),
          expr("t_3 div 1000").as("t3_ms"),
          col("n_steps"))
        .orderBy("user_id")
    },
    // conversion-latency distribution over the funnel output: exact
    // percentiles of step-2 and total conversion time across entities —
    // the "how fast do users convert" readout on top of funnel_steps.
    // Cost beyond the funnel itself: one single-group sort-based
    // percentile over ≤|entities| rows
    "funnel_latency" -> { (s, d) =>
      import graft.ops.EventOps
      val f = EventOps.funnel(
        Tables.events(s, d).withColumn("tsu", expr("ts div 1000")),
        "user_id", "tsu", "event_type", Seq("signup", "click", "purchase"))
      f.agg(
        count(lit(1)).as("n_entered"),
        count(col("t_2")).as("n_step2"),
        count(col("t_3")).as("n_completed"),
        percentile((col("t_2") - col("t_1")).cast("double"), lit(0.5))
          .as("p50_step2_us"),
        percentile((col("t_3") - col("t_1")).cast("double"), lit(0.5))
          .as("p50_total_us"),
        percentile((col("t_3") - col("t_1")).cast("double"), lit(0.9))
          .as("p90_total_us"))
    },
    // any-anchor funnel under a 1-hour conversion window: a user whose
    // first signup times out but who re-enters and converts counts here
    // (anchored-first funnel_steps reads them as n_steps = 1). Bounded by
    // construction: the earliest 3 anchors per user, state m × steps
    // timestamps (see EventOps.funnelAnyAnchor)
    "funnel_any" -> { (s, d) =>
      import graft.ops.EventOps
      EventOps.funnelAnyAnchor(
          Tables.events(s, d).withColumn("tsu", expr("ts div 1000")),
          "user_id", "tsu", "event_type",
          Seq("signup", "click", "purchase"),
          maxGap = Some(3600000000L), maxAnchors = 3)
        .select(col("user_id"),
          expr("t_1 div 1000").as("t1_ms"),
          expr("t_2 div 1000").as("t2_ms"),
          expr("t_3 div 1000").as("t3_ms"),
          col("n_steps"))
        .orderBy("user_id")
    },
    // fixed-width histogram of the value distribution — the numeric
    // profiling pass; bin arithmetic is a single IEEE divide+floor on
    // identical operands, so the oracle matches exactly
    "agg_histogram" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / 25.0).as("bin")) // floor is LongType
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(38,2)")).cast("double")
            .as("sum_value"))
        .withColumn("lo", (col("bin") * 25.0))
        .select("bin", "lo", "n", "sum_value")
        .orderBy("bin")
    },
    // trailing-hour rolling aggregate per user — a RANGE-frame window
    // (value-based bounds over event time), distinct from the row-frame
    // running sum of window_running; integer-µs time on both engines
    "window_range_time" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("tsu"))
        .rangeBetween(-3600000000L, 0L) // trailing hour, µs
      Tables.events(s, d)
        .withColumn("tsu", expr("ts div 1000"))
        .select(col("event_id"), col("user_id"), col("tsu"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(38,2)")).over(w).cast("double")
            .as("sum_1h"))
        .orderBy("event_id")
    },
    // top event-type trigrams across user timelines ("user journey"
    // mining) — one entity-key window + a map-side-combined count over a
    // path key space bounded by |event types|^3; time ordered in integer
    // µs on both engines (see funnel_steps), event_id breaking ties
    "path_ngrams" -> { (s, d) =>
      import graft.ops.EventOps
      EventOps.pathNgrams(
          Tables.events(s, d).withColumn("tsu", expr("ts div 1000")),
          "user_id", "tsu", "event_type", n = 3, tieCols = Seq("event_id"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    },
    // bloom-pruned join: the fact side sheds non-joining rows BEFORE the
    // shuffle via a dim-side Bloom sketch (manual InjectRuntimeFilter —
    // same XxHash64/BloomFilterAggregate pair). Result-identical to the
    // plain join, so the oracle is the plain join.
    // skew-salted join declared as a query: the fact side's hot supplier
    // keys spread over 8 salt lanes (dim replicated ×8), then the exact
    // aggregate — result-identical to the plain join (the oracle IS the
    // plain join), only the shuffle shape differs. The knob a 1000-executor
    // run turns when one key holds 10% of the fact table and AQE's
    // partition-splitting can't help (a single hot KEY still hashes to one
    // task without the salt)
    "join_salted" -> { (s, d) =>
      import graft.ops.ScaleOps
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      ScaleOps.saltedJoin(li, sup, "s_suppkey", saltFactor = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(38,2)")).cast("double")
            .as("sum_qty"))
        .orderBy("s_nationkey")
    },
    "join_bloom" -> { (s, d) =>
      import graft.ops.ScaleOps
      val li = Tables.lineitem(s, d)
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val sel = Tables.orders(s, d)
        .where(col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_orderpriority")
      ScaleOps.bloomPrunedJoin(li, sel, "o_orderkey",
          expectedDimKeys = 100000L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(38,2)")).cast("double")
            .as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    // cohort retention triangle: users bucketed by first-seen day, distinct
    // active users per (cohort, day-offset) — integer bucket arithmetic
    // (exact on both engines), two key-shuffles total
    "cohort_retention" -> { (s, d) =>
      import graft.ops.EventOps
      EventOps.cohortRetention(
          Tables.events(s, d).withColumn("tsu", expr("ts div 1000")),
          "user_id", "tsu", width = 86400000000L)
        .orderBy("cohort", "offset")
    }
  )

  val oracle: Map[String, String] = Map(
    // the plain join — salting must be invisible in the result
    "join_salted" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_hash" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_semi_anti" ->
      """SELECT * FROM (
        | SELECT 'with_orders' AS tag, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        | FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | GROUP BY 2
        | UNION ALL
        | SELECT 'no_orders' AS tag, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        | FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | GROUP BY 2)
        |ORDER BY tag, c_mktsegment""".stripMargin,
    "join_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        | coalesce(c_name, '<no-customer>') AS name,
        | coalesce(n_orders, 0) AS n_orders
        |FROM customer FULL OUTER JOIN (
        | SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        | FROM orders GROUP BY 1) ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "join_range" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
        |FROM orders JOIN lineitem
        | ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_hamming" ->
      """WITH x AS (
        | SELECT doc_id,
        |  (((doc_id >> 3) % 1024) << 11) + (doc_id & 7)
        |   + ((n_chars % 8) << 5) AS x
        | FROM documents),
        |f AS (
        | SELECT doc_id, xor(xor(x, x << 21), x << 42) AS fp FROM x)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
        |FROM f a JOIN f b
        | ON bit_count(xor(a.fp, b.fp)) <= 4 AND a.doc_id < b.doc_id
        |ORDER BY 1, 2""".stripMargin,
    "join_interval" ->
      """WITH pts AS (
        | SELECT event_id, (event_id * 131) % 1000000 AS p FROM events),
        |iv AS (
        | SELECT o_orderkey, (o_orderkey * 700) % 1000000 AS lo,
        |  (o_orderkey * 700) % 1000000 + (o_orderkey % 5) * 12 AS hi
        | FROM orders)
        |SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_events,
        | min(event_id) AS min_eid, max(event_id) AS max_eid
        |FROM pts JOIN iv ON p >= lo AND p <= hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_overlap" ->
      """WITH a AS (
        | SELECT o_orderkey, (o_orderkey * 700) % 1000000 AS alo,
        |  (o_orderkey * 700) % 1000000 + (o_orderkey % 5) * 12 AS ahi
        | FROM orders),
        |b AS (
        | SELECT p_partkey, (p_partkey * 1100) % 1000000 AS blo,
        |  (p_partkey * 1100) % 1000000 + (p_partkey % 7) * 16 AS bhi
        | FROM part)
        |SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_overlaps,
        | min(o_orderkey) AS min_ord, max(o_orderkey) AS max_ord
        |FROM a JOIN b ON alo <= bhi AND blo <= ahi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |   * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avg_qty,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        | coalesce(l_linestatus, 'ALL') AS ls,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        | coalesce(l_linestatus, 'ALL') AS ls,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "window_rank" ->
      """SELECT * FROM (
        | SELECT c_mktsegment,
        |  CAST(row_number() OVER (PARTITION BY c_mktsegment
        |   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
        |  o_orderkey, o_totalprice
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "window_running" ->
      """SELECT l_orderkey,
        | CAST(row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey)
        |  AS BIGINT) AS rn,
        | l_linenumber,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) OVER (
        |  PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        |FROM lineitem ORDER BY l_orderkey, rn""".stripMargin,
    "sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "window_dist" ->
      """SELECT c_mktsegment, c_custkey,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "scalar_conditional" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | CASE WHEN l_quantity > 30 THEN 'bulk'
        |      WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS size_class,
        | nullif(l_linestatus, 'O') AS closed_status,
        | coalesce(nullif(l_returnflag, 'N'), '~') AS rf_or,
        | greatest(l_discount, l_tax) AS max_rate,
        | least(l_discount, l_tax) AS min_rate
        |FROM lineitem WHERE l_orderkey < 10000
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | l_partkey, l_suppkey""".stripMargin,
    "set_ops_all" ->
      """SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
        | (SELECT o_custkey AS k FROM orders
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        | INTERSECT ALL
        | SELECT o_custkey FROM orders
        | EXCEPT ALL
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |GROUP BY k ORDER BY k""".stripMargin,
    "stable_split" ->
      """SELECT doc_id,
        | CASE WHEN CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)
        |        AS BIGINT) < 204 THEN 'train'
        |      WHEN CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)
        |        AS BIGINT) < 230 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "set_ops" ->
      """SELECT k FROM (
        | ((SELECT o_custkey AS k FROM orders
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |  INTERSECT
        |  SELECT c_custkey FROM customer)
        | EXCEPT
        | SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY k""".stripMargin,
    "scalar_datetime" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        | CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_string_math" ->
      """SELECT p_partkey,
        | upper(p_brand) AS br_up,
        | substr(p_name, 1, 8) AS name8,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | round(p_retailprice, 1) AS price_r1,
        | CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
        | CAST(p_size % 7 AS BIGINT) AS size_mod,
        | sqrt(p_retailprice) AS price_sqrt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "join_asof" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
        | epoch_us(p.ts) AS last_purchase_ts, p.value AS last_purchase_val
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        | ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,
    // sketch error contracts: the oracle recomputes the exact side and
    // states the bound booleans as constants
    "agg_approx_distinct_check" ->
      """SELECT event_type,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        | TRUE AS ok_within_5pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_quantiles_approx_check" ->
      """SELECT l_returnflag, TRUE AS ok_p50_bracketed
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_asof_tol" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
        | epoch_us(p.ts) AS last_purchase_ts, p.value AS last_purchase_val
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        | ON c.user_id = p.user_id AND p.ts <= c.ts
        |WHERE epoch_us(c.ts) - epoch_us(p.ts) <= 43200000000
        |ORDER BY c.event_id""".stripMargin,
    "explode_array" ->
      """SELECT event_id,
        | unnest(range(2)) AS pos,
        | unnest(string_split(concat_ws(',', event_type,
        |   CAST(user_id AS VARCHAR)), ',')) AS val
        |FROM events ORDER BY event_id, pos""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        | coalesce(CAST(sum(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE), 0.0) AS click,
        | coalesce(CAST(sum(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE), 0.0) AS error,
        | coalesce(CAST(sum(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE), 0.0) AS purchase,
        | coalesce(CAST(sum(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE), 0.0) AS signup,
        | coalesce(CAST(sum(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE), 0.0) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "window_lag" ->
      """SELECT event_id, user_id, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | CAST(rank() OVER w AS BIGINT) AS rnk
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY event_id""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        | coalesce(l_linestatus, 'ALL') AS ls, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "agg_collect" ->
      """SELECT user_id,
        | list_aggregate(list_sort(list(event_id)), 'string_agg', ',') AS event_ids_csv,
        | list_aggregate(list_sort(list(DISTINCT event_type)), 'string_agg', ',') AS types_csv
        |FROM events WHERE user_id < 5
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_median" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS median_value,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_quantiles" ->
      """SELECT l_returnflag,
        | quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS q25,
        | quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS q50,
        | quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS q75,
        | quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS price_p50
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_session" ->
      """WITH x AS (
        | SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        | FROM events),
        |g AS (
        | SELECT user_id, ts, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        | FROM x)
        |SELECT epoch_ms(min(ts)) AS s_start_ms,
        | epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS s_end_ms,
        | user_id, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, s_start_ms""".stripMargin,
    "agg_window_time" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // integer-µs time on both sides (epoch_us ↔ Spark's `ts div 1000`);
    // each step's min is taken strictly after the previous step's min
    "funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
        |s1 AS (SELECT user_id, min(tu) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(tu) AS t2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND tu > t1 GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(tu) AS t3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tu > t2 GROUP BY 1)
        |SELECT s1.user_id,
        | CAST(t1 // 1000 AS BIGINT) AS t1_ms,
        | CAST(t2 // 1000 AS BIGINT) AS t2_ms,
        | CAST(t3 // 1000 AS BIGINT) AS t3_ms,
        | CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |        + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_steps
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,
    // same funnel CTE as funnel_steps; quantile_cont ↔ percentile (both
    // linear-interpolation on doubles, nulls ignored)
    "funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
        |s1 AS (SELECT user_id, min(tu) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(tu) AS t2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND tu > t1 GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(tu) AS t3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tu > t2 GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_entered,
        | CAST(count(t2) AS BIGINT) AS n_step2,
        | CAST(count(t3) AS BIGINT) AS n_completed,
        | quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.5) AS p50_step2_us,
        | quantile_cont(CAST(t3 - t1 AS DOUBLE), 0.5) AS p50_total_us,
        | quantile_cont(CAST(t3 - t1 AS DOUBLE), 0.9) AS p90_total_us
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,
    // per-(user, anchor) greedy chains over the earliest 3 signup anchors,
    // best chain per user by (n_steps DESC, t1); time in integer µs on
    // both engines like funnel_steps
    "funnel_any" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
        |a AS (SELECT user_id, tu AS t1,
        |        row_number() OVER (PARTITION BY user_id ORDER BY tu) AS anchor
        |      FROM ev WHERE event_type = 'signup' QUALIFY anchor <= 3),
        |s2 AS (SELECT a.user_id, a.anchor, min(tu) AS t2
        |       FROM ev JOIN a USING (user_id)
        |       WHERE event_type = 'click' AND tu > t1
        |         AND tu <= t1 + 3600000000 GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, s2.anchor, min(tu) AS t3
        |       FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tu > t2
        |         AND tu <= t2 + 3600000000 GROUP BY 1, 2),
        |c AS (SELECT a.user_id, t1, t2, t3,
        |        1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS n_steps
        |      FROM a LEFT JOIN s2 USING (user_id, anchor)
        |             LEFT JOIN s3 USING (user_id, anchor))
        |SELECT user_id,
        | CAST(t1 // 1000 AS BIGINT) AS t1_ms,
        | CAST(t2 // 1000 AS BIGINT) AS t2_ms,
        | CAST(t3 // 1000 AS BIGINT) AS t3_ms,
        | CAST(n_steps AS BIGINT) AS n_steps
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |                           ORDER BY n_steps DESC, t1) = 1
        |ORDER BY user_id""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
        | CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS lo,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_range_time" ->
      """SELECT event_id, user_id, epoch_us(ts) AS tsu,
        | CAST(count(*) OVER w AS BIGINT) AS n_1h,
        | CAST(sum(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "path_ngrams" ->
      """WITH o AS (
        | SELECT user_id, event_type,
        |  lead(event_type, 1) OVER w AS e2,
        |  lead(event_type, 2) OVER w AS e3
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT concat_ws('>', event_type, e2, e3) AS path,
        | CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "join_bloom" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cohort_retention" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bkt
        |           FROM events),
        |f AS (SELECT user_id, min(bkt) AS cohort FROM b GROUP BY 1)
        |SELECT cohort, CAST(bkt - cohort AS BIGINT) AS "offset",
        | CAST(count(DISTINCT b.user_id) AS BIGINT) AS n_active
        |FROM b JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
