package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash for the dedup tiers.
  *
  * The composable form — `transform(sequence(0,k−1), sd =>
  * array_min(transform(shingles, sh => xxhash64(sh, sd))))` — is a nest of
  * higher-order functions: interpreted (CodegenFallback), and it re-hashes
  * every shingle STRING once per seed, O(k·S) string hashes per document.
  * These expressions inline into whole-stage codegen and exploit the seed
  * structure of `xxhash64(sh, sd)` = `hashInt(sd, hashUTF8String(sh, 42))`:
  * the string is hashed ONCE (h1), and each seed costs one integer mix —
  * O(S + k·S_mix) with the expensive part k-independent.
  *
  * Bit-compatibility contract: [[MinHashSigF]] reproduces
  * `min(xxhash64(s, lit(i)))` exactly, and [[SigBandsF]] reproduces
  * `xxhash64(slice(sig, b·r+1, r), b)` exactly (array fold from seed 42,
  * then `hashInt(b)` — the operand order of the two-arg `xxhash64` call),
  * so swapping implementations changes no signature bit, no band bucket,
  * no persisted index row, and no RECALL.md number (asserted in
  * DedupSpec's parity cases).
  */
case class MinHashSigF(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null on empty input (a doc with no shingles has no signature — callers
  // filter those rows, mirroring the groupBy form emitting no row)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // a null element leaves xxhash64's running state at the seed — the
      // exact two-arg xxhash64 semantics (nulls are skipped, not poisoned)
      val h1 =
        if (arr.isNullAt(i)) 42L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
      var sd = 0
      while (sd < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(sd, h1)
        if (h < mins(sd)) mins(sd) = h
        sd += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sd = ctx.freshName("sd")
      val h1 = ctx.freshName("h1")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h1 = $v.isNullAt($i) ? 42L
         |      : $xxh.hashUTF8String($v.getUTF8String($i), 42L);
         |    for (int $sd = 0; $sd < $numHashes; $sd++) {
         |      long $h = $xxh.hashInt($sd, $h1);
         |      if ($h < $mins[$sd]) $mins[$sd] = $h;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigF =
    copy(child = newChild)
}

/** Band hashes of a MinHash signature: `bands` entries, entry b =
  * `xxhash64(slice(sig, b·r+1, r), b)` with r = len/bands — the LSH bucket
  * keys. Null when the signature length is not divisible by `bands`.
  */
case class SigBandsF(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0, s"bands must be positive, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_bands expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0 || n % bands != 0) return null
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var j = b * r
      while (j < (b + 1) * r) {
        // null elements are skipped — xxhash64's array semantics
        if (!arr.isNullAt(j))
          acc = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(arr.getLong(j), acc)
        j += 1
      }
      out(b) = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(b, acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |if ($n == 0 || $n % $bands != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $r = $n / $bands;
         |  long[] $out = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $acc = 42L;
         |    for (int $j = $b * $r; $j < ($b + 1) * $r; $j++) {
         |      if (!$v.isNullAt($j)) $acc = $xxh.hashLong($v.getLong($j), $acc);
         |    }
         |    $out[$b] = $xxh.hashInt($b, $acc);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SigBandsF =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken) as one
  * codegen'd pass over the word array: rolling polynomial hash of each
  * word k-gram (bit-identical to `TextOps.fingerprint` over the
  * `concat_ws(" ", …)` gram — single-space splitting round-trips empty
  * words, so slicing the array equals re-splitting the gram string), then
  * the distinct minima of every w-site sliding window (tail windows
  * partial, matching `Dedup.winnowFingerprints`), returned sorted
  * ascending. Replaces an explode + doc-partitioned window — a full
  * shuffle and sort of every gram site — with a narrow projection.
  * Null when the doc has fewer than k words (no sites).
  */
case class WinnowFpF(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fp expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nGrams = n - k + 1
    if (nGrams < 1) return null
    // per-word value: length(w)*256 + ascii(w); null words hash like the
    // Column fold (transform yields null → aggregate's +null → null gram
    // hash never happens in practice: concat_ws skips nulls, so mirror
    // by treating null as the empty word, value 0)
    val wv = new Array[Long](n)
    var i = 0
    while (i < n) {
      wv(i) =
        if (arr.isNullAt(i)) 0L
        else {
          val s = arr.getUTF8String(i)
          // ascii() = code point of the FIRST CHARACTER (Spark's Ascii
          // takes substring(0,1).codePointAt(0), not the first byte)
          val f = s.substring(0, 1)
          val first =
            if (f.numBytes() > 0) f.toString.codePointAt(0).toLong else 0L
          s.numChars().toLong * 256L + first
        }
      i += 1
    }
    val h = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var acc = 0L
      var j = i
      while (j < i + k) { acc = (acc * 31L + wv(j)) % 1000000007L; j += 1 }
      h(i) = acc
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      var m = h(i)
      var j = i + 1
      val end = math.min(i + w, nGrams)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      sel.add(m)
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val nGrams = ctx.freshName("nGrams")
      val wv = ctx.freshName("wv")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val end = ctx.freshName("end")
      val sel = ctx.freshName("sel")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val it = ctx.freshName("it")
      s"""
         |int $n = $v.numElements();
         |int $nGrams = $n - $k + 1;
         |if ($nGrams < 1) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $wv = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      org.apache.spark.unsafe.types.UTF8String $s = $v.getUTF8String($i);
         |      org.apache.spark.unsafe.types.UTF8String ${s}f = $s.substring(0, 1);
         |      $wv[$i] = (long) $s.numChars() * 256L
         |        + (${s}f.numBytes() > 0
         |            ? (long) ${s}f.toString().codePointAt(0) : 0L);
         |    }
         |  }
         |  long[] $h = new long[$nGrams];
         |  for (int $i = 0; $i < $nGrams; $i++) {
         |    long $acc = 0L;
         |    for (int $j = $i; $j < $i + $k; $j++) {
         |      $acc = ($acc * 31L + $wv[$j]) % 1000000007L;
         |    }
         |    $h[$i] = $acc;
         |  }
         |  java.util.TreeSet<Long> $sel = new java.util.TreeSet<Long>();
         |  for (int $i = 0; $i < $nGrams; $i++) {
         |    long $m = $h[$i];
         |    int $end = java.lang.Math.min($i + $w, $nGrams);
         |    for (int $j = $i + 1; $j < $end; $j++) {
         |      if ($h[$j] < $m) $m = $h[$j];
         |    }
         |    $sel.add($m);
         |  }
         |  long[] $out = new long[$sel.size()];
         |  int $i = 0;
         |  for (java.util.Iterator<Long> $it = $sel.iterator(); $it.hasNext(); $i++) {
         |    $out[$i] = ((Long) $it.next()).longValue();
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFpF =
    copy(child = newChild)
}

/** 64-bit SimHash (Charikar) of a word array in one codegen'd pass:
  * per word h = xxhash64(word) (seed 42), ±1 vote per bit, majority →
  * bit. Bit-identical to the explode + packed-lane groupBy pipeline it
  * replaces (DedupSpec parity case) with two upgrades: no vote shuffle
  * at all (the fingerprint is computed in the scan stage), and plain int
  * counters instead of 4×16-bit lanes — the 32767-word document bound is
  * gone. Duplicate words vote once per occurrence, like the explode form.
  */
case class SimHash64F(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null element: single-arg xxhash64 of null stays at the seed
      val h =
        if (arr.isNullAt(i)) 42L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) != 0L) cnt(b) += 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (2L * cnt(b) > n) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |int $n = $v.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $v.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($v.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >> $b) & 1L) != 0L) $cnt[$b]++;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2L * $cnt[$b] > $n) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64F =
    copy(child = newChild)
}

object MinHash {
  /** k MinHash values of a shingle array (codegen'd; null on empty). */
  def signature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSigF(Bridge.expression(shingles), k))

  /** LSH band bucket keys of a signature (codegen'd). */
  def bandHashes(sig: Column, bands: Int): Column =
    Bridge.column(SigBandsF(Bridge.expression(sig), bands))

  /** Sorted distinct winnowing fingerprints of a word array (codegen'd;
    * null when fewer than k words).
    */
  def winnowFingerprints(words: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFpF(Bridge.expression(words), k, w))

  /** 64-bit SimHash of a word array (codegen'd). */
  def simHash64(words: Column): Column =
    Bridge.column(SimHash64F(Bridge.expression(words)))

  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case n: Number => n.intValue
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** SQL-callable registration: `minhash_sig(shingles, k)`,
    * `sig_bands(sig, bands)`, `simhash64(words)`,
    * `winnow_fp(words, k, w)` — size arguments must be literals (they fix
    * the generated code's loop bounds).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }

  /** SQL-callable (name, builder) pairs — consumed per-session by
    * [[registerAll]] and fleet-wide by
    * [[graft.plans.GraftExtensions]]'s `injectFunction`.
    */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> (es => MinHashSigF(es(0), litInt(es(1), "numHashes"))),
    "sig_bands" -> (es => SigBandsF(es(0), litInt(es(1), "bands"))),
    "simhash64" -> (es => SimHash64F(es(0))),
    "winnow_fp" ->
      (es => WinnowFpF(es(0), litInt(es(1), "k"), litInt(es(2), "w"))))
}
