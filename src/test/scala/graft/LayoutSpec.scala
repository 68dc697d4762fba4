package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave to check the columnar form against. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorderKey matches the reference interleave on exhaustive small inputs") {
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(col("x"), col("y"), bits = 5).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 5),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorderKey widens int inputs (bit 15 must not wrap the int sign)") {
    val rows = Seq((32768, 40000), (1, 2)).toDF("x", "y") // IntegerType cols
    val got = rows
      .select(Layout.zorderKey(col("x"), col("y"), bits = 16).as("z"))
      .collect().map(_.getLong(0))
    got.foreach(z => assert(z >= 0L, s"wrapped negative z $z"))
    assert(got(0) == mortonRef(32768L & 0xffff, 40000L & 0xffff, 16))
  }

  test("writeZOrdered produces files with disjoint z-ranges (file pruning)") {
    val df = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(df, "a", "b", dir, numFiles = 8, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096)
    // recompute z per row with its source file: range partitioning must
    // give non-overlapping [min,max] z intervals per file — that is the
    // property parquet footer pruning relies on
    val ranges = back
      .withColumn("z", Layout.zorderKey(col("a"), col("b"), bits = 6))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"$ranges overlap")
      case _ =>
    }
  }
}
