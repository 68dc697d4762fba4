package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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
      val n = ctx.freshName("n")
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

object VectorFunctions {
  /** dot(a, b): Σ a(i)·b(i) in double, left-to-right (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** 0-based index of the nearest centroid (squared L2, codegen'd). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroidF(Bridge.expression(vec),
      centroids.toIndexedSeq.map(_.toIndexedSeq)))

  /** SQL-callable registration: `SELECT vec_dot(a, b) FROM …`. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "vec_dot", es => DotProductF(es(0), es(1)))
}
