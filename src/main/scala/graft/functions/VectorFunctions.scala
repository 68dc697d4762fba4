package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native vector arithmetic for the similarity/dedup surface.
  *
  * The first implementation used `aggregate(zip_with(...))` — but Spark's
  * higher-order functions are `CodegenFallback`: every element evaluation
  * walks an interpreted lambda, and a pair-join that computes one dot
  * product per candidate pair pays ~dim interpreted calls per row. These
  * expressions inline into whole-stage codegen like any built-in.
  *
  * Numeric contract (what keeps the DuckDB oracle bit-exact): accumulate in
  * `double`, strictly left-to-right — identical order to both the old
  * `aggregate`-fold form and DuckDB's `list_reduce`, so swapping
  * implementations changes no output bit.
  *
  *  - [[DotProductF]]     — Σ a(i)·b(i) over the common prefix length.
  *  - [[NearestCentroidF]] — argmin over a small broadcast centroid table of
  *    squared L2 distance; the IVF cell-assignment map (FAISS-style coarse
  *    quantizer, ref SURVEY.md §7.4 north-star ops). Centroids ride along as
  *    a reference object in the generated class — no per-row allocation.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // the result can be null for NON-null inputs (length mismatch / null
  // element), so nullable must not derive from the children — a
  // non-nullable child (e.g. a literal plane array) would otherwise make
  // codegen drop the isNull slot this expression assigns
  override def nullable: Boolean = true

  // SQL-reachable (vec_dot), so analysis must reject non-float/double
  // arrays — getDouble over int-backed ArrayData would reinterpret bytes
  // silently (ExpectsInputTypes isn't declarable outside the sql package;
  // AbstractDataType is private[sql])
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float>/array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // Null contract — identical to the `aggregate(zip_with(a, b, _*_))` fold
  // this replaces: unequal lengths (zip_with pads with null) or any null
  // element make the WHOLE result null, never a silently-wrong partial sum.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) return null
    val n = aa.numElements()
    val fa = isFloat(left); val fb = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (fa) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (fb) bb.getFloat(i).toDouble else bb.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; ${ev.value} = 0.0; break;
         |    }
         |    ${ev.value} += $getA * $getB;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Index (0-based) of the centroid nearest to `vec` in squared L2.
  * `centroids` is plan-constant data (the coarse quantizer is tiny —
  * nlist × dim doubles), carried via `addReferenceObj`, so the generated
  * code reads it as a field — the Spark-idiomatic shape for
  * "broadcast-small-model, scan-big-data" scoring.
  */
case class NearestCentroidF(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // null on null elements (see below)

  // Seq (not Array) parameter: case-class equality over arrays is
  // reference identity, which would break semanticEquals/CSE between two
  // expressions built from equal-valued (but distinct) centroid tables.
  private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val dim: Int = if (cents.isEmpty) 0 else cents(0).length

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float>/array<double>, got " +
            other.simpleString)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val fl = isFloat
    // wrong dimensionality or null elements → null result (a partial
    // distance would silently assign corrupt vectors to a cell)
    if (arr.numElements() != dim) return null
    var j = 0
    while (j < arr.numElements()) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cen = cents(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)) - cen(i)
        d += x * x
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("centroids", cents, "double[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val bestD = ctx.freshName("bestD")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; }
         |for (int $j = 0; !${ev.isNull} && $j < $v.numElements(); $j++) {
         |  if ($v.isNullAt($j)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  double $bestD = Double.MAX_VALUE;
         |  ${ev.value} = 0;
         |  for (int $c = 0; $c < $cs.length; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $x = $get - $cs[$c][$i];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; ${ev.value} = $c; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidF =
    copy(child = newChild)
}

/** 0-based indices of the `k` centroids nearest to `vec` (squared L2),
  * ordered nearest-first with index tie-breaks — the MULTI-ASSIGNMENT
  * coarse quantizer (each vector joins its k nearest cells at build
  * time, so a probe of few cells still sees boundary-straddling
  * vectors; the recall-preserving alternative to fattening nprobe).
  * Same plan-constant centroid table and null contract as
  * [[NearestCentroidF]] (wrong dim / null element → null row — a
  * partial distance must not assign corrupt vectors anywhere), and the
  * same degenerate-distance contract: NaN/Inf distances never win the
  * strict `<`, and any slot left unfilled backfills with the smallest
  * unused centroid index — so k=1 returns `[0]` exactly where
  * [[NearestCentroidF]] returns 0, and the output is always k valid
  * 0-based duplicate-free cells (never -1, which would silently write
  * rows into an unprobeable partition).
  * Selection is a k-slot insertion pass (k is 2-4 in practice, far
  * under nlist), one fused loop in codegen.
  */
case class NearestCentroidsKF(child: Expression, centroids: Seq[Seq[Double]],
    k: Int) extends UnaryExpression {
  require(k >= 1 && k <= centroids.length,
    s"k must be in [1, ${centroids.length}], got $k")

  private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val dim: Int = if (cents.isEmpty) 0 else cents(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids_k expects array<float>/array<double>, got " +
            other.simpleString)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    var j = 0
    while (j < arr.numElements()) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val fl = isFloat
    val bestI = Array.fill(k)(-1)
    val bestD = Array.fill(k)(Double.MaxValue)
    var c = 0
    while (c < cents.length) {
      val cen = cents(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)) - cen(i)
        d += x * x
        i += 1
      }
      // strict < keeps the EARLIEST index on distance ties (insertion
      // never displaces an equal-distance earlier centroid)
      if (d < bestD(k - 1)) {
        var s = k - 1
        while (s > 0 && d < bestD(s - 1)) {
          bestD(s) = bestD(s - 1); bestI(s) = bestI(s - 1); s -= 1
        }
        bestD(s) = d; bestI(s) = c
      }
      c += 1
    }
    // NaN/Inf distances never pass the strict <, so slots can stay
    // unfilled (always a suffix — insertion fills from the front).
    // Backfill with the smallest unused centroid indices: k=1 then
    // returns [0] for an all-NaN vector, matching NearestCentroidF's
    // `best = 0` initial, and the output stays 0-based duplicate-free.
    var nextFree = 0
    var s = 0
    while (s < k) {
      if (bestI(s) == -1) {
        var t = 0
        while (t < s) {
          if (bestI(t) == nextFree) { nextFree += 1; t = -1 }
          t += 1
        }
        bestI(s) = nextFree; nextFree += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bestI.map(_.asInstanceOf[Any]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("centroidsK", cents, "double[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val bi = ctx.freshName("bestI")
      val bd = ctx.freshName("bestD")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; }
         |for (int $j = 0; !${ev.isNull} && $j < $v.numElements(); $j++) {
         |  if ($v.isNullAt($j)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  int[] $bi = new int[$k];
         |  double[] $bd = new double[$k];
         |  for (int $s = 0; $s < $k; $s++) {
         |    $bi[$s] = -1; $bd[$s] = Double.MAX_VALUE;
         |  }
         |  for (int $c = 0; $c < $cs.length; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $x = $get - $cs[$c][$i];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bd[$k - 1]) {
         |      int $s = $k - 1;
         |      for (; $s > 0 && $d < $bd[$s - 1]; $s--) {
         |        $bd[$s] = $bd[$s - 1]; $bi[$s] = $bi[$s - 1];
         |      }
         |      $bd[$s] = $d; $bi[$s] = $c;
         |    }
         |  }
         |  // backfill NaN/Inf-starved slots with the smallest unused
         |  // indices — see nullSafeEval (k=1 ⇒ [0], NearestCentroidF's
         |  // contract)
         |  int $x = 0;
         |  for (int $s = 0; $s < $k; $s++) {
         |    if ($bi[$s] == -1) {
         |      for (int $j = 0; $j < $s; $j++) {
         |        if ($bi[$j] == $x) { $x++; $j = -1; }
         |      }
         |      $bi[$s] = $x; $x++;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidsKF = copy(child = newChild)
}

/** All hyperplane-LSH table signatures of a vector in ONE codegen'd pass:
  * output element t is the `nbits`-bit signature over sign rows
  * `t*nbits ..< (t+1)*nbits` of `signs` (a ±1 matrix of
  * `tables*nbits` hyperplanes × dim, plan-constant via `addReferenceObj`).
  *
  * Bit-compatibility contract with the composed form it replaces
  * (`sum_j when(vec_dot(vec, plane_j) >= 0, 1<<j)` per table — 32+
  * separate 64-literal array dots whose codegen dominated the whole
  * bucketing stage): the per-plane accumulation is the same
  * left-to-right `acc += v(i) * sign(i)` double fold, and the sign test
  * reproduces Spark's `>=` ordering where NaN compares greater than any
  * number (`isNaN || >= 0`), so every signature bit is identical
  * (SimilaritySpec parity case over a NaN/mismatch fuzz corpus).
  * Length-mismatched vectors and vectors with null elements keep the old
  * all-zero signatures (each plane dot was null → bit 0). The one
  * deliberate difference: a NULL vector now yields a NULL signature
  * array (the row drops out of bucketing) instead of bucket 0 in every
  * table — a null embedding has no business pair-joining inside bucket 0.
  */
case class LshSigsF(child: Expression, signs: Seq[Seq[Double]], nbits: Int)
    extends UnaryExpression {
  require(nbits > 0 && signs.nonEmpty && signs.length % nbits == 0,
    s"signs rows (${signs.length}) must be a positive multiple of nbits=$nbits")

  private lazy val sgn: Array[Array[Double]] = signs.map(_.toArray).toArray
  private lazy val dim: Int = sgn(0).length
  private lazy val tables: Int = sgn.length / nbits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_sigs expects array<float>/array<double>, got " +
            other.simpleString)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    var ok = arr.numElements() == dim
    var i = 0
    while (ok && i < dim) { if (arr.isNullAt(i)) ok = false; i += 1 }
    if (ok) {
      val fl = isFloat
      var p = 0
      while (p < sgn.length) {
        val row = sgn(p)
        var acc = 0.0
        var j = 0
        while (j < dim) {
          acc += (if (fl) arr.getFloat(j).toDouble else arr.getDouble(j)) * row(j)
          j += 1
        }
        if (java.lang.Double.isNaN(acc) || acc >= 0.0)
          out(p / nbits) |= (1L << (p % nbits))
        p += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sg = ctx.addReferenceObj("lshSigns", sgn, "double[][]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val get = if (isFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      s"""
         |long[] $out = new long[$tables];
         |boolean $ok = $v.numElements() == $dim;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) $ok = false;
         |}
         |if ($ok) {
         |  for (int $p = 0; $p < ${sgn.length}; $p++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $get * $sg[$p][$j];
         |    }
         |    if (Double.isNaN($acc) || $acc >= 0.0) {
         |      $out[$p / $nbits] |= (1L << ($p % $nbits));
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSigsF =
    copy(child = newChild)
}

/** [[LshSigsF]] plus QUERY-DIRECTED single-bit probe variants, for
  * multi-probe LSH on the PAIR-MINING side (Lv et al., VLDB 2007 — the
  * same margin argument [[graft.ext.Similarity.probeKeysMultiTableAdaptive]]
  * uses driver-side for serving, here as a per-row codegen pass): a near
  * neighbour disagrees with this vector on plane p with probability
  * rising as |margin p| shrinks, so flipping the weakest-margin bits
  * yields the buckets its missed neighbours most likely live in.
  *
  * Output element `t*(probes+1)` is table t's home signature —
  * bit-identical to [[LshSigsF]] element t (same fold, same NaN-ge sign
  * test) — followed by `probes` variants of it, each flipping one plane
  * in weakest-|margin|-first order (NaN margins rank last — flipping a
  * plane whose sign was the NaN branch is meaningless; margin ties break
  * by plane index). Same degenerate contracts as [[LshSigsF]]:
  * dim-mismatch / null-element vectors keep all-zero home signatures
  * (their margins all tie at 0 ⇒ probes flip planes 0,1,.. —
  * deterministic), a NULL vector yields a NULL array.
  */
case class LshSigsProbesF(child: Expression, signs: Seq[Seq[Double]],
    nbits: Int, probes: Int) extends UnaryExpression {
  require(nbits > 0 && signs.nonEmpty && signs.length % nbits == 0,
    s"signs rows (${signs.length}) must be a positive multiple of nbits=$nbits")
  require(probes >= 1 && probes < nbits,
    s"probes must be in [1, nbits=$nbits), got $probes")

  private lazy val sgn: Array[Array[Double]] = signs.map(_.toArray).toArray
  private lazy val dim: Int = sgn(0).length
  private lazy val tables: Int = sgn.length / nbits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_sigs_probes expects array<float>/array<double>, got " +
            other.simpleString)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Long](tables * (probes + 1))
    var ok = arr.numElements() == dim
    var i = 0
    while (ok && i < dim) { if (arr.isNullAt(i)) ok = false; i += 1 }
    val fl = isFloat
    val margins = new Array[Double](nbits)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < nbits) {
        var acc = 0.0
        if (ok) {
          val row = sgn(t * nbits + p)
          var j = 0
          while (j < dim) {
            acc += (if (fl) arr.getFloat(j).toDouble
            else arr.getDouble(j)) * row(j)
            j += 1
          }
        }
        if (ok && (java.lang.Double.isNaN(acc) || acc >= 0.0))
          sig |= (1L << p)
        margins(p) =
          if (java.lang.Double.isNaN(acc)) Double.PositiveInfinity
          else math.abs(acc)
        p += 1
      }
      val base = t * (probes + 1)
      out(base) = sig
      // selection by repeated scan: probes is 1-2 in practice, nbits tiny
      val used = new Array[Boolean](nbits)
      var q = 0
      while (q < probes) {
        var bestP = -1
        var bestM = 0.0
        var s = 0
        while (s < nbits) {
          if (!used(s) && (bestP == -1 || margins(s) < bestM)) {
            bestP = s; bestM = margins(s)
          }
          s += 1
        }
        used(bestP) = true
        out(base + 1 + q) = sig ^ (1L << bestP)
        q += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sg = ctx.addReferenceObj("lshSigns", sgn, "double[][]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val mg = ctx.freshName("margins")
      val used = ctx.freshName("used")
      val sig = ctx.freshName("sig")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val bp = ctx.freshName("bestP")
      val bm = ctx.freshName("bestM")
      val get = if (isFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      s"""
         |long[] $out = new long[${tables * (probes + 1)}];
         |boolean $ok = $v.numElements() == $dim;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) $ok = false;
         |}
         |double[] $mg = new double[$nbits];
         |boolean[] $used = new boolean[$nbits];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $nbits; $p++) {
         |    double $acc = 0.0;
         |    if ($ok) {
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $acc += $get * $sg[$t * $nbits + $p][$j];
         |      }
         |    }
         |    if ($ok && (Double.isNaN($acc) || $acc >= 0.0)) {
         |      $sig |= (1L << $p);
         |    }
         |    $mg[$p] = Double.isNaN($acc)
         |      ? Double.POSITIVE_INFINITY : Math.abs($acc);
         |    $used[$p] = false;
         |  }
         |  $out[$t * ${probes + 1}] = $sig;
         |  for (int $q = 0; $q < $probes; $q++) {
         |    int $bp = -1;
         |    double $bm = 0.0;
         |    for (int $s = 0; $s < $nbits; $s++) {
         |      if (!$used[$s] && ($bp == -1 || $mg[$s] < $bm)) {
         |        $bp = $s; $bm = $mg[$s];
         |      }
         |    }
         |    $used[$bp] = true;
         |    $out[$t * ${probes + 1} + 1 + $q] = $sig ^ (1L << $bp);
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LshSigsProbesF = copy(child = newChild)
}

/** BATCHED ADC (asymmetric distance computation) for PQ serving: the
  * approximate dot of a PQ-coded row against the query selected by
  * `qIdx` — `Σ_j luts(qIdx)(j)(code_j)`, the per-query lookup tables a
  * plan-constant reference object (one batch of queries = ONE plan,
  * where the literal-table form would bloat the plan by
  * |queries|·m·codes literals). `qIdx` is the DENSE 0-based batch index
  * (the caller maps external query ids); children are `qIdx` followed
  * by the m code columns, left-to-right summation matching the
  * single-query `element_at(typedLit(...))` form bit-for-bit. Any null
  * child → null (codes are non-null in the index by construction).
  */
case class PqAdcBatchF(children: Seq[Expression],
    luts: Seq[Seq[Seq[Double]]]) extends Expression {
  require(children.length >= 2, "need qIdx + at least one code column")
  require(luts.nonEmpty && luts.forall(_.length == children.length - 1),
    s"luts must carry ${children.length - 1} tables per query")

  private lazy val tbl: Array[Array[Array[Double]]] =
    luts.map(_.map(_.toArray).toArray).toArray
  private def m: Int = children.length - 1

  override def dataType: DataType = DoubleType
  // always a variable in codegen (assigning to a FalseLiteral isNull is
  // invalid Java); the index's code columns are non-null in practice
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "pq_adc_batch expects int qIdx + int code columns, got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val qi = children.head.eval(input)
    if (qi == null) return null
    val q = tbl(qi.asInstanceOf[Int])
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = children(j + 1).eval(input)
      if (c == null) return null
      s += q(j)(c.asInstanceOf[Int])
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val lut = ctx.addReferenceObj("pqAdcLuts", tbl, "double[][][]")
    val evals = children.map(_.genCode(ctx))
    val q = ctx.freshName("qtbl")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCheck = evals.map(_.isNull).mkString(" || ")
    val sum = (0 until m).map(j =>
      s"    ${ev.value} += $q[$j][${evals(j + 1).value}];").mkString("\n")
    val body =
      s"""
         |$childCode
         |boolean ${ev.isNull} = $nullCheck;
         |double ${ev.value} = 0.0;
         |if (!${ev.isNull}) {
         |  double[][] $q = $lut[${evals.head.value}];
         |$sum
         |}
       """.stripMargin
    ev.copy(code = code"$body")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcBatchF =
    copy(children = newChildren)
}

object VectorFunctions {
  /** dot(a, b): Σ a(i)·b(i) in double, left-to-right (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** 0-based index of the nearest centroid (squared L2, codegen'd). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroidF(Bridge.expression(vec),
      centroids.toIndexedSeq.map(_.toIndexedSeq)))

  /** 0-based indices of the k nearest centroids, nearest-first
    * (multi-assignment coarse quantizer, codegen'd).
    */
  def nearestCentroidsK(vec: Column, centroids: Array[Array[Double]],
      k: Int): Column =
    Bridge.column(NearestCentroidsKF(Bridge.expression(vec),
      centroids.toIndexedSeq.map(_.toIndexedSeq), k))

  /** All hyperplane-LSH table signatures in one codegen'd pass: element t
    * is the nbits-bit signature over sign rows t*nbits ..< (t+1)*nbits.
    */
  def lshSigs(vec: Column, signs: Array[Array[Double]], nbits: Int): Column =
    Bridge.column(LshSigsF(Bridge.expression(vec),
      signs.toIndexedSeq.map(_.toIndexedSeq), nbits))

  /** Batched ADC: approx dot of a PQ-coded row against the query picked
    * by the dense 0-based `qIdx` column — per-query lookup tables ride
    * as ONE plan-constant reference object.
    */
  def pqAdcBatch(qIdx: Column, codes: Seq[Column],
      luts: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqAdcBatchF(
      (qIdx +: codes).map(Bridge.expression), luts))

  /** [[lshSigs]] plus `probes` weakest-margin single-bit flip variants
    * per table (multi-probe pair mining): element t*(probes+1) is table
    * t's home signature, followed by its probe variants.
    */
  def lshSigsProbes(vec: Column, signs: Array[Array[Double]], nbits: Int,
      probes: Int): Column =
    Bridge.column(LshSigsProbesF(Bridge.expression(vec),
      signs.toIndexedSeq.map(_.toIndexedSeq), nbits, probes))

  /** SQL-callable (name, builder) pairs — consumed per-session by
    * [[registerAll]] and fleet-wide by
    * [[graft.plans.GraftExtensions]]'s `injectFunction`.
    */
  def sqlBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "vec_dot" -> (es => DotProductF(es(0), es(1))))

  /** SQL-callable registration: `SELECT vec_dot(a, b) FROM …`. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }
}
