package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the one
  * piece of text cleanup Spark has no built-in for (canonical composition:
  * "e" + U+0301 combining acute → precomposed U+00E9), needed before
  * hash-based dedup so canonically-equal byte-different strings collide.
  * A UDF would box every row and break whole-stage codegen; this emits a
  * static `java.text.Normalizer` call inline in the generated stage, same
  * pattern as [[KeccakHash]]. The full cleanup pipeline
  * ([[graft.ext.TextOps.normalizeText]]) composes this with codegen'd
  * built-in regexp_replace for control-char strip + whitespace collapse —
  * the custom expression covers only what built-ins genuinely can't.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // already-NFC fast path: isNormalized is a cheap scan, normalize
    // allocates — most real text is already composed
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNorm {
  /** Unicode-NFC-normalize a string column (codegen'd, null-preserving). */
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** SQL-callable (name, builder) pairs — consumed per-session by
    * [[registerAll]] and fleet-wide by
    * [[graft.plans.GraftExtensions]]'s `injectFunction`.
    */
  def sqlBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "nfc_normalize" -> (es => NfcNormalize(es.head)))

  /** Make `nfc_normalize(s)` SQL-callable (DuckDB-compatible name). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }
}
