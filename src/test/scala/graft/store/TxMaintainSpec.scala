package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** White-box proofs for round 9's store-scale fixes (package-private
  * access to the manifest): incremental bin-packing maintain (frozen
  * directories stay byte-identical; physical-only commit), the lazy
  * distributed truncation result, and vacuum's age-since-dereference
  * grace.
  */
class TxMaintainSpec extends SparkSpec {
  import spark.implicits._
  import TxLogTable.{binpackGroups, Entry}

  private def mkLogs(blockFrom: Long, blockTo: Long, perBlock: Int = 2) =
    (blockFrom to blockTo).flatMap { b =>
      (0 until perBlock).map(i =>
        (i.toLong, s"tx-$b-$i", b, s"h$b", s"a${b % 3}",
          Seq("sig"), "0x"))
    }.toDF("tx_index", "tx_hash", "block_num", "block_hash", "address",
      "topics", "data")

  private def e(name: String, lo: Long, hi: Long): Entry =
    Entry(name, lo, hi, lo, hi, Long.MaxValue)

  test("binpack plan: adjacent small runs merge, frozen entries stay singletons") {
    val entries = Seq(
      e("A", 0, 99999),          // frozen (100k rows)
      e("b", 100000, 100009), e("c", 100010, 100019), e("d", 100020, 100029),
      e("E", 100030, 200029),    // frozen
      e("f", 200030, 200039), e("g", 200040, 200049))
    val groups = binpackGroups(entries, targetGroups = 10, smallRows = 1000L)
    assert(groups.map(_.map(_.name)) ==
      Vector(Vector("A"), Vector("b", "c", "d"), Vector("E"),
        Vector("f", "g")))
  }

  test("binpack plan: ladder merges the cheapest adjacent pair until the target") {
    val entries = (0 until 6).map(i =>
      e(s"E$i", i * 1000L, i * 1000L + (if (i == 2 || i == 3) 9L else 999L)))
    val groups = binpackGroups(entries, targetGroups = 3, smallRows = 1L)
    assert(groups.length == 3)
    // every input entry appears exactly once, in index order
    assert(groups.flatten.map(_.name) == (0 until 6).map(i => s"E$i").toVector)
    // the two 10-row entries (E2, E3) are the cheapest adjacent pair —
    // the ladder must merge them first
    assert(groups.exists(g => g.map(_.name).containsSlice(Seq("E2", "E3"))))
  }

  test("maintain is incremental: frozen directory untouched, physical-only commit") {
    val root = tmpDir("txmaint")
    val t = new TxLogTable(spark, root, "f1")
    t.storeLogs(mkLogs(0, 999)) // 2000 rows — frozen at smallRows=100
    val dataDir = new java.io.File(s"$root/txlogs/filter_hash=f1/data")
    val bigDir = dataDir.listFiles().filter(_.isDirectory) match {
      case Array(d) => d
      case other => fail(s"expected one data dir, got ${other.length}")
    }
    val bigFiles = bigDir.listFiles().map(f =>
      (f.getName, f.length(), f.lastModified())).sortBy(_._1).toSeq
    (0 until 6).foreach(i => t.storeLogs(mkLogs(1000L + i, 1000L + i)): Unit)
    val vBefore = t.version()
    assert(t.manifest().entries.length == 7)

    assert(t.maintain(maxEntries = 4, smallRows = 100L))

    // physical-only commit: op recorded, content identical, feed empty
    val m = t.manifest()
    assert(m.op == "optimize")
    assert(m.entries.length == 2, s"expected [frozen, merged]: ${m.entries}")
    assert(m.entries.map(_.name).contains(bigDir.getName),
      "the frozen entry must keep its directory")
    assert(bigDir.listFiles().map(f =>
      (f.getName, f.length(), f.lastModified())).sortBy(_._1).toSeq
      == bigFiles, "the frozen directory must stay byte-identical")
    assert(t.read.count() == 2012L)
    assert(t.read.select("indx").as[Long].collect().sorted.toSeq
      == (0L until 2012L))
    assert(t.changesBetween(vBefore, t.version()).count() == 0L,
      "optimize must contribute nothing to the change feed")
    // time travel still serves the pre-optimize snapshot
    assert(t.readAt(vBefore).count() == 2012L)
    // under threshold now: maintain is a no-op
    assert(!t.maintain(maxEntries = 4, smallRows = 100L))
  }

  test("maintain never rewrites frozen rows across repeated streaming rounds") {
    val root = tmpDir("txmaint")
    val t = new TxLogTable(spark, root, "f1")
    var next = 0L
    def appendSmalls(count: Int): Unit = (0 until count).foreach { _ =>
      t.storeLogs(mkLogs(next, next)): Unit // 2 rows per commit
      next += 1
    }
    // round 1: the small tail merges and (at 18 rows ≥ smallRows) freezes
    appendSmalls(9)
    assert(t.maintain(maxEntries = 8, smallRows = 10L))
    val frozen = t.manifest().entries match {
      case Seq(one) => one.name
      case other => fail(s"expected one merged entry, got $other")
    }
    // rounds 2..4: each maintain merges ONLY its own tail; the frozen
    // directory from round 1 is never rewritten
    (0 until 3).foreach { _ =>
      appendSmalls(9)
      assert(t.maintain(maxEntries = 8, smallRows = 10L))
      assert(t.manifest().entries.map(_.name).contains(frozen),
        "a frozen run must survive later maintains untouched")
    }
    assert(t.read.count() == next * 2)
    assert(t.manifest().entries.length == 4) // one frozen run per round
  }

  test("removeLogsFrom is lazy and distributed — no driver materialization") {
    val root = tmpDir("txmaint")
    val t = new TxLogTable(spark, root, "f1")
    val n = 1000000L
    t.storeLogs(spark.range(n).select(
      (col("id") % 8).as("tx_index"),
      concat(lit("tx-"), col("id")).as("tx_hash"),
      (col("id") / 4).cast("long").as("block_num"),
      concat(lit("h"), (col("id") / 4).cast("long")).as("block_hash"),
      concat(lit("a"), col("id") % 97).as("address"),
      array(lit("sig")).as("topics"), lit("0x").as("data")))
    val removed = t.removeLogsFrom(0L)
    // the result must be a relation scan over the retained snapshot, not
    // rows pinned on the driver
    val plan = removed.queryExecution.optimizedPlan
    assert(plan.collectLeaves().forall(l =>
      !l.nodeName.contains("LocalRelation")),
      s"truncation result is driver-materialized:\n$plan")
    assert(plan.collectLeaves().exists(_.nodeName.contains("Relation")),
      s"expected a parquet relation leaf:\n$plan")
    assert(t.lastIndex() == 0L)
    assert(removed.count() == n)
    val mm = removed.agg(min("indx"), max("indx")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == n - 1)
  }

  test("vacuum grace is age-since-dereference, not age-since-write") {
    val root = tmpDir("txmaint")
    val t = new TxLogTable(spark, root, "f1", retainVersions = 1)
    t.storeLogs(mkLogs(0, 9))
    val dataDir = new java.io.File(s"$root/txlogs/filter_hash=f1/data")
    val d1 = dataDir.listFiles().filter(_.isDirectory).head
    // make the directory LOOK two hours old, then dereference it NOW
    val twoHoursAgo = System.currentTimeMillis() - 2L * 3600 * 1000
    assert(d1.setLastModified(twoHoursAgo))
    t.compact() // retainVersions=1: d1 is unreferenced immediately
    // age-since-write policy would collect d1 here; the dereference grace
    // must protect it (an in-flight reader of the just-expired snapshot)
    assert(t.vacuum(olderThanMs = 3600L * 1000) == 0)
    assert(d1.exists(), "a just-dereferenced directory must survive grace")
    // once the DROP MARKER itself ages past the grace, it collects
    val marker = new java.io.File(d1, ".dropped")
    assert(marker.exists(), "first pass must stamp the drop marker")
    assert(marker.setLastModified(twoHoursAgo))
    assert(t.vacuum(olderThanMs = 3600L * 1000) == 1)
    assert(!d1.exists())
    assert(t.read.count() == 20L)
  }
}
