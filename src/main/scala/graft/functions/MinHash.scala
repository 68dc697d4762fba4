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

object MinHash {
  /** k MinHash values of a shingle array (codegen'd; null on empty). */
  def signature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSigF(Bridge.expression(shingles), k))

  /** LSH band bucket keys of a signature (codegen'd). */
  def bandHashes(sig: Column, bands: Int): Column =
    Bridge.column(SigBandsF(Bridge.expression(sig), bands))
}
