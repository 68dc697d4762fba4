package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{SimJoin, SimJoinRewrite}

/** The declarative similarity-join rewrite: `bit_count(a ^ b) <= d` joins
  * must produce the nested-loop plan's exact multiset of rows while the
  * executed plan carries no cartesian/nested-loop operator.
  */
class SimJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Fingerprint corpus with planted near-pairs, far rows, exact
    * duplicates (multiset semantics) and a null fingerprint.
    */
  private def corpus(): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, rnd.nextLong()))
    val near = base.take(10).map { case (id, fp) =>
      // flip 3 bits spread across bands
      (id + 1000L, fp ^ (1L << (id % 60)) ^ (1L << 62) ^ 2L)
    }
    val rows: Seq[(java.lang.Long, java.lang.Long)] =
      (base ++ near ++ Seq(base(5), base(5))) // duplicate row twice more
        .map { case (id, fp) =>
          (java.lang.Long.valueOf(id), java.lang.Long.valueOf(fp))
        } :+ ((java.lang.Long.valueOf(9999L), null: java.lang.Long))
    val a = rows.toDF("id_a", "fp_a")
    val b = rows.map { case (i, f) => (i, f) }.toDF("id_b", "fp_b")
    (a, b)
  }

  private def withRule[T](f: => T): T = OptimizerLock.synchronized {
    val saved = spark.experimental.extraOptimizations
    SimJoin.install(spark)
    try f finally spark.experimental.extraOptimizations = saved
  }

  /** Baselines need the rules ABSENT — other suites run the declared
    * join_hamming/join_interval queries, whose lambdas install the
    * rewrites on the shared session for good.
    */
  private def withoutRules[T](f: => T): T = OptimizerLock.synchronized {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(r =>
      (r eq SimJoinRewrite) || (r eq graft.plans.RangeJoinRewrite))
    try f finally spark.experimental.extraOptimizations = saved
  }

  private def key(r: org.apache.spark.sql.Row): (Long, Long) =
    (r.getLong(0), r.getLong(1))

  test("rewritten join: exact multiset parity with the nested-loop plan") {
    val (a, b) = corpus()
    def q(): DataFrame =
      a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 3 && $"id_a" < $"id_b")
        .select($"id_a", $"id_b")
    // naive (rules absent): BroadcastNestedLoopJoin
    val (naivePlan, naive) = withoutRules {
      (q().queryExecution.executedPlan.toString,
        q().collect().map(key).groupBy(identity).view
          .mapValues(_.length).toMap)
    }
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"),
      s"expected a nested-loop baseline, got:\n$naivePlan")
    assert(naive.nonEmpty, "corpus must produce near-pairs")
    // planted duplicates must appear with multiplicity > 1 in the baseline
    assert(naive.exists(_._2 > 1), "expected duplicate-row multiplicity")
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

  test("exactly-once: identical fingerprints (all bands agree) pair once") {
    val a = Seq((1L, 42L), (2L, 42L)).toDF("id_a", "fp_a")
    val b = Seq((3L, 42L)).toDF("id_b", "fp_b")
    val out = withRule {
      a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 4)
        .select($"id_a", $"id_b").collect().map(key).toSeq
    }
    assert(out.sorted == Seq((1L, 3L), (2L, 3L)))
  }

  test("null fingerprints drop out, as in the nested-loop form") {
    val a = Seq((java.lang.Long.valueOf(1L), null: java.lang.Long))
      .toDF("id_a", "fp_a")
    val b = Seq((java.lang.Long.valueOf(2L), java.lang.Long.valueOf(0L)))
      .toDF("id_b", "fp_b")
    val out = withRule {
      a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 64).count()
    }
    assert(out == 0L)
  }

  test("guards: equi-keyed, vacuous, and straddling conditions are untouched") {
    withoutRules {
    val (a, b) = corpus()
    def optimized(df: DataFrame) = df.queryExecution.optimizedPlan
    // already hash-joinable: equality conjunct present
    val equi = a.join(b, $"id_a" === $"id_b" &&
      SimJoin.hamming64($"fp_a", $"fp_b") <= 3)
    assert(SimJoinRewrite(optimized(equi)) eq optimized(equi))
    // d >= 64 is vacuously true — no banding possible
    val vac = a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 64)
    assert(SimJoinRewrite(optimized(vac)) eq optimized(vac))
    // fingerprint expression straddling both sides: not a similarity join
    val straddle = a.join(b,
      bit_count($"fp_a".bitwiseXOR($"id_b")
        .bitwiseXOR($"id_a".bitwiseXOR($"fp_b"))) <= 3)
    assert(SimJoinRewrite(optimized(straddle)) eq optimized(straddle))
    // the positive case DOES change
    val pos = a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 3)
    assert(!(SimJoinRewrite(optimized(pos)) eq optimized(pos)))
    }
  }

  test("fuzz: random corpora, thresholds and extra conjuncts match the nested loop") {
    val rnd = new scala.util.Random(97)
    for (round <- 0 until 5) {
      val n = 20 + rnd.nextInt(40)
      // clustered fingerprints so every d has matches: random base,
      // flip 0..12 random bits
      val bases = Array.fill(4)(rnd.nextLong())
      def fp() = {
        var f = bases(rnd.nextInt(bases.length))
        (0 until rnd.nextInt(13)).foreach(_ => f ^= 1L << rnd.nextInt(64))
        f
      }
      val a = (0 until n).map(i => (i.toLong, fp())).toDF("id_a", "fp_a")
      val b = (0 until n).map(i => (i.toLong, fp())).toDF("id_b", "fp_b")
      val d = 1 + rnd.nextInt(10)
      val withExtra = rnd.nextBoolean()
      def q() = {
        val cond0 = SimJoin.hamming64($"fp_a", $"fp_b") <= d
        val cond = if (withExtra) cond0 && $"id_a" =!= $"id_b" else cond0
        a.join(b, cond).select($"id_a", $"id_b")
      }
      val naive = withoutRules { q().collect().map(key).sorted.toSeq }
      val (out, plan) = withRule {
        (q().collect().map(key).sorted.toSeq,
          q().queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"round $round not rewritten")
      assert(out == naive, s"round $round: d=$d extra=$withExtra mismatch " +
        s"(${out.size} vs ${naive.size} rows)")
    }
  }

  test("GraftExtensions wires both rewrites into a session at build time") {
    // the fleet-wide deployment artifact (what
    // spark.sql.extensions=graft.plans.GraftExtensions names on a real
    // cluster — the static conf itself only applies on a FRESH
    // SparkContext, so the test injects the class through the builder's
    // withExtensions hook). getOrCreate only applies extensions when it
    // creates, so clear the session registry for the duration (under the
    // lock; the SparkContext is reused).
    OptimizerLock.synchronized {
      val saved = spark
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      try {
        val s2 = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .withExtensions(new graft.plans.GraftExtensions())
          .getOrCreate()
        assert(s2 ne saved, "builder must have created a fresh session")
        import s2.implicits._
        val a = (0 until 20).map(i => (i.toLong, i.toLong * 7)).toDF("id_a", "fp_a")
        val b = (0 until 20).map(i => (i.toLong, i.toLong * 7)).toDF("id_b", "fp_b")
        val ham = a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 2)
          .queryExecution.executedPlan.toString
        assert(!ham.contains("BroadcastNestedLoopJoin") &&
          !ham.contains("CartesianProduct"), s"hamming not rewritten:\n$ham")
        val pts = (0 until 20).map(i => (i.toLong, i.toLong * 5)).toDF("pid", "p")
        val ivs = (0 until 10).map(i => (i.toLong, i * 10L, i * 10L + 8))
          .toDF("rid", "lo", "hi")
        val rng = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
          .queryExecution.executedPlan.toString
        assert(!rng.contains("BroadcastNestedLoopJoin") &&
          !rng.contains("CartesianProduct"), s"interval not rewritten:\n$rng")
      } finally {
        org.apache.spark.sql.SparkSession.setDefaultSession(saved)
        org.apache.spark.sql.SparkSession.setActiveSession(saved)
      }
    }
  }

  test("GraftExtensions injects the SQL function surface at build time") {
    // a pure-SQL user (spark.sql.extensions=graft.plans.GraftExtensions,
    // no per-module registerAll call) must see every library function
    OptimizerLock.synchronized {
      val saved = spark
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      try {
        val s2 = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .withExtensions(new graft.plans.GraftExtensions())
          .getOrCreate()
        assert(s2 ne saved, "builder must have created a fresh session")
        val kec = s2.sql("SELECT keccak256('') AS h").head().getString(0)
        // keccak-256 of empty input — the canonical known-answer vector
        assert(kec ==
          "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
        assert(s2.sql(
          "SELECT dict_match_count('a spam b spam', array('spam')) AS n")
          .head().getLong(0) == 2L)
        assert(s2.sql(
          "SELECT dict_scrub('a spam b', array('spam'), '*') AS s")
          .head().getString(0) == "a * b")
        assert(s2.sql("SELECT nfc_normalize('e\u0301') AS s")
          .head().getString(0) == "\u00e9")
        assert(s2.sql(
          "SELECT vec_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d")
          .head().getDouble(0) == 11.0)
        assert(s2.sql("SELECT size(minhash_sig(array('a','b'), 8)) AS n")
          .head().getInt(0) == 8)
        assert(s2.sql("SELECT simhash64(array('a','b')) AS f")
          .head().schema.head.dataType ==
          org.apache.spark.sql.types.LongType)
      } finally {
        org.apache.spark.sql.SparkSession.setDefaultSession(saved)
        org.apache.spark.sql.SparkSession.setActiveSession(saved)
      }
    }
  }

  test("GraftExtensions injects the transactional table-valued functions") {
    // pure-SQL time travel / change feed / history over a TxLogTable —
    // the Delta table_changes TVF shape
    val root = tmpDir("tvf")
    locally {
      import spark.implicits._
      val t = new graft.store.TxLogTable(spark, root, "f1")
      def logs(b0: Long, b1: Long) = (b0 to b1).flatMap(b =>
        (0 until 2).map(i => (i.toLong, s"tx-$b-$i", b, s"h$b", "a0",
          Seq("sig"), "0x")))
        .toDF("tx_index", "tx_hash", "block_num", "block_hash", "address",
          "topics", "data")
      t.storeLogs(logs(0, 4))   // v1: 0..9
      t.storeLogs(logs(5, 9))   // v2: 10..19
      t.removeLogsFrom(15L)     // v3
    }
    OptimizerLock.synchronized {
      val saved = spark
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      try {
        val s2 = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .withExtensions(new graft.plans.GraftExtensions())
          .getOrCreate()
        assert(s2 ne saved, "builder must have created a fresh session")
        assert(s2.sql(
          s"SELECT count(*) AS n FROM tx_table_at('$root', 'f1', 2)")
          .head().getLong(0) == 20L)
        assert(s2.sql(
          s"SELECT count(*) AS n FROM tx_table_at('$root', 'f1', 3)")
          .head().getLong(0) == 15L)
        val ch = s2.sql(
          s"""SELECT _commit_version, _change_type, count(*) AS n
             |FROM tx_table_changes('$root', 'f1', 0, 3)
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        assert(ch.toSeq == Seq((1L, "insert", 10L), (2L, "insert", 10L),
          (3L, "delete", 5L)))
        assert(s2.sql(
          s"SELECT operation FROM tx_table_history('$root', 'f1') " +
            "ORDER BY version").collect().map(_.getString(0)).toSeq ==
          Seq("append", "append", "truncate"))
        // TIMESTAMP AS OF "now" = the current (post-truncation) state
        val now = System.currentTimeMillis() + 1000
        assert(s2.sql(
          s"SELECT count(*) AS n FROM tx_table_at_time('$root', 'f1', $now)")
          .head().getLong(0) == 15L)
        // FOLDABLE (non-literal) arguments resolve to the same plan:
        // constant arithmetic, constant function calls, session variables
        assert(s2.sql(
          s"SELECT count(*) AS n FROM tx_table_at('$root', 'f1', 1 + 1)")
          .head().getLong(0) == 20L)
        val (head, tail) = root.splitAt(root.length / 2)
        assert(s2.sql("SELECT count(*) AS n FROM tx_table_at(" +
          s"concat('$head', '$tail'), 'f1', 2)").head().getLong(0) == 20L)
        s2.sql("DECLARE VARIABLE tvf_root STRING")
        s2.sql(s"SET VARIABLE tvf_root = '$root'")
        assert(s2.sql(
          "SELECT count(*) AS n FROM tx_table_at(tvf_root, 'f1', 2)")
          .head().getLong(0) == 20L)
        // non-foldable arguments still error out, not silently misread
        intercept[Exception](s2.sql(
          s"SELECT * FROM tx_table_at('$root', 'f1', 1 + version)"))
      } finally {
        org.apache.spark.sql.SparkSession.setDefaultSession(saved)
        org.apache.spark.sql.SparkSession.setActiveSession(saved)
      }
    }
  }

  test("comparison orientations and strict < are recognized") {
    val (a, b) = corpus()
    val forms = Seq(
      a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") < 4),
      a.join(b, lit(3) >= SimJoin.hamming64($"fp_a", $"fp_b")),
      a.join(b, lit(4) > SimJoin.hamming64($"fp_b", $"fp_a")),
      // long literal: the analyzer wraps bit_count in a widening cast
      a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 3L))
    val expect = withRule {
      forms.head.select($"id_a", $"id_b").collect().map(key).sorted.toSeq
    }
    forms.foreach { f =>
      val (out, plan) = withRule {
        (f.select($"id_a", $"id_b").collect().map(key).sorted.toSeq,
          f.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      assert(out == expect)
    }
  }
}
