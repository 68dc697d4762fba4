package graft

import org.apache.spark.sql.functions._

import graft.ext.{IndexLifecycle, Similarity}

/** ANN index lifecycle: small-file compaction (append debt) with
  * bit-identical probes and crash recovery, and the versioned
  * rebuild-while-serving pointer swap.
  */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def mkVecs(ids: Seq[Long], seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val centers = (0 until 4).map(_ => Array.fill(16)(rnd.nextGaussian()))
    ids.map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + 0.25 * rnd.nextGaussian()).toFloat).toSeq)
    }
  }

  private def bits(r: org.apache.spark.sql.Row) =
    (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))

  private def probe(idx: org.apache.spark.sql.DataFrame,
      qv: Array[Float]): Seq[(Long, Long)] =
    Similarity.annTopKMultiTable(idx, qv, "vec_id", "embedding",
        dim = 16, nbits = 4, tables = 4, k = 8,
        probeHamming = 0, probeBudget = 3)
      .collect().map(bits).toSeq

  test("compactIndex: append-debt directories collapse to the built " +
    "layout; probes bit-identical before/after; cold dirs untouched") {
    val all = mkVecs(0L until 300L, 11)
    val standing = all.filter(_._1 % 4 != 0).toDF("vec_id", "embedding")
    val batches = (1 to 3).map(b =>
      all.filter(p => p._1 % 4 == 0 && p._1 % 3 == b % 3)
        .toDF("vec_id", "embedding"))
    val path = tmpDir("lshmt-compact")
    Similarity.writeLshMultiTableIndex(standing, "vec_id", "embedding",
      path, dim = 16, nbits = 4, tables = 4)
    batches.foreach(b => Similarity.appendLshMultiTableIndex(b, "vec_id",
      "embedding", path, dim = 16, nbits = 4, tables = 4))

    def fileCounts: Map[String, Int] =
      new java.io.File(path).listFiles().filter(_.isDirectory)
        .filterNot(_.getName.startsWith("_"))
        .map(d => d.getName -> d.listFiles()
          .count(f => f.isFile && f.getName.startsWith("part-"))).toMap
    val before = fileCounts
    assert(before.values.max > 2, "append debt not created")

    val qs = Seq(0L, 1L, 4L, 77L).map(q => all(q.toInt)._2.toArray)
    val preIdx = spark.read.parquet(path)
    val pre = qs.map(probe(preIdx, _))
    val expectedRows = preIdx.count()

    val n = IndexLifecycle.compactIndex(spark, path, "vec_id",
      maxFilesPerDir = 2)
    assert(n > 0, "no directories compacted")
    val after = fileCounts
    // hot dirs collapsed; cold dirs' files untouched
    assert(after.values.max <= 2, s"still-hot dirs after compact: $after")
    before.filter(_._2 <= 2).foreach { case (d, c) =>
      assert(after(d) == c, s"cold dir $d was rewritten")
    }
    // no trash/tmp siblings survive a clean compact
    val parent = new java.io.File(path).getParentFile
    assert(!parent.listFiles().exists(f =>
      f.getName.contains(".trash-") || f.getName.contains(".compact-")),
      "compaction left siblings")

    val postIdx = spark.read.parquet(path)
    assert(postIdx.count() == expectedRows, "row count changed")
    val post = qs.map(probe(postIdx, _))
    assert(pre == post, "probes diverged across compaction")
    // idempotent: a second compact is a no-op
    assert(IndexLifecycle.compactIndex(spark, path, "vec_id",
      maxFilesPerDir = 2) == 0)
  }

  test("compactIndex recovery: a crash between rename-out and rename-in " +
    "rolls forward from the complete tmp") {
    val vecs = mkVecs(0L until 200L, 23).toDF("vec_id", "embedding")
    val path = tmpDir("lshmt-recover")
    Similarity.writeLshMultiTableIndex(vecs, "vec_id", "embedding",
      path, dim = 16, nbits = 4, tables = 4)
    val qv = mkVecs(Seq(5L), 23).head._2.toArray
    val pre = probe(spark.read.parquet(path), qv)

    // simulate the narrowest crash window: one key dir renamed OUT to
    // trash, its compacted replacement complete in tmp (_SUCCESS), crash
    // before rename-in — the live tree is missing the key
    val self = new java.io.File(path)
    val keyDir = self.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("lsh_key=")).maxBy(_.getName)
    val parent = self.getParentFile
    val tmp = new java.io.File(parent, self.getName + ".compact-crash1")
    val trash = new java.io.File(parent, self.getName + ".trash-crash1")
    java.nio.file.Files.createDirectories(tmp.toPath)
    java.nio.file.Files.createDirectories(trash.toPath)
    // tmp gets a byte-identical "compacted" copy of the key dir
    val tmpKey = new java.io.File(tmp, keyDir.getName)
    java.nio.file.Files.createDirectories(tmpKey.toPath)
    keyDir.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(tmpKey, f.getName).toPath)
    }
    new java.io.File(tmp, "_SUCCESS").createNewFile()
    // rename-out happened; rename-in did not
    assert(keyDir.renameTo(new java.io.File(trash, keyDir.getName)))
    assert(!keyDir.exists())

    // recovery runs at the head of the next maintenance call
    IndexLifecycle.compactIndex(spark, path, "vec_id", maxFilesPerDir = 99)
    assert(keyDir.exists(), "key dir not restored")
    assert(!trash.exists() && !tmp.exists(), "crash siblings not swept")
    val post = probe(spark.read.parquet(path), qv)
    assert(pre == post, "probe diverged after crash recovery")
  }

  test("publish/currentPath/vacuum: rebuild-while-serving — a held " +
    "reader stays on its version, the pointer cut is all-or-nothing") {
    val root = tmpDir("idx-versions")
    val allB = mkVecs(0L until 300L, 31)
    val corpusA = allB.take(200).toDF("vec_id", "embedding")
    // v2 = A grown 50% — the re-train-at-N×-growth shape
    val corpusB = allB.toDF("vec_id", "embedding")

    assert(IndexLifecycle.currentVersion(root).isEmpty)
    val v1 = IndexLifecycle.publish(spark, root) { dir =>
      Similarity.writeLshMultiTableIndex(corpusA, "vec_id", "embedding",
        dir, dim = 16, nbits = 4, tables = 4)
    }
    assert(v1 == 1)
    val v1Path = IndexLifecycle.currentPath(root).get
    val served = spark.read.parquet(v1Path) // the in-flight reader
    val qv = allB(250)._2.toArray // corpus vector 250 — only in corpusB
    val preSwap = probe(served, qv)
    assert(!preSwap.map(_._1).contains(250L))

    val v2 = IndexLifecycle.publish(spark, root) { dir =>
      Similarity.writeLshMultiTableIndex(corpusB, "vec_id", "embedding",
        dir, dim = 16, nbits = 4, tables = 4)
    }
    assert(v2 == 2)
    // the held reader still serves v1 — bit-identical, no mixed index
    assert(probe(served, qv) == preSwap, "held reader saw the new version")
    // a fresh resolve serves v2 and finds the new vector
    val fresh = spark.read.parquet(IndexLifecycle.currentPath(root).get)
    assert(probe(fresh, qv).map(_._1).contains(250L))

    // vacuum reclaims v1 once drained; v2 keeps serving
    assert(IndexLifecycle.vacuum(spark, root) == Seq(1))
    assert(!new java.io.File(root, "v1").exists())
    assert(probe(spark.read.parquet(
      IndexLifecycle.currentPath(root).get), qv).map(_._1).contains(250L))
  }
}
