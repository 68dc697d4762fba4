package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the event-decode surface (SURVEY.md §2.9,
  * §7.5): a UDF would box every row and block whole-stage codegen; these are
  * native expressions with `doGenCode`, so they inline into the generated
  * stage like any built-in.
  *
  *  - [[KeccakHash]]  — keccak256 hex of a string/binary column (topic0 =
  *    keccak(eventSig), ref `README.md:28-34`). Codegen emits a static call.
  *  - [[LeU64]]       — little-endian u64 from a binary column at an offset
  *    (the payload decode in `README.md:101-102`). Codegen is pure inline
  *    arithmetic — no allocation per row.
  */
case class KeccakHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String  => s.getBytes
      case b: Array[Byte] => b
    }
    UTF8String.fromString(Keccak.hash256Hex(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val conv =
        if (child.dataType == StringType) s"byte[] $bytes = $c.getBytes();"
        else s"byte[] $bytes = $c;"
      s"""
         |$conv
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Keccak.hash256Hex($bytes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KeccakHash =
    copy(child = newChild)
}

/** Little-endian u64 read from `bytes` at byte `offset`; missing bytes read
  * as zero (tolerant decode, like the reference's slice-based reads).
  */
case class LeU64(bytes: Expression, offset: Expression)
    extends BinaryExpression {
  override def left: Expression = bytes
  override def right: Expression = offset
  override def dataType: DataType = LongType

  override def nullSafeEval(b: Any, off: Any): Any = {
    val arr = b.asInstanceOf[Array[Byte]]
    // accept any integral offset — the generated code's `(int) off` cast
    // is width-agnostic, and the interpreted path must match it
    // (AbstractDataType is private[sql], so ExpectsInputTypes coercion
    // isn't declarable from here)
    val o = off.asInstanceOf[Number].intValue()
    var v = 0L
    var i = 0
    while (i < 8) {
      if (o + i < arr.length && o + i >= 0)
        v |= (arr(o + i) & 0xffL) << (8 * i)
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, off) => {
      val i = ctx.freshName("i")
      val o = ctx.freshName("o")
      s"""
         |int $o = (int) $off;
         |${ev.value} = 0L;
         |for (int $i = 0; $i < 8; $i++) {
         |  if ($o + $i >= 0 && $o + $i < $b.length) {
         |    ${ev.value} |= (((long) $b[$o + $i]) & 0xffL) << (8 * $i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LeU64 =
    copy(bytes = newLeft, offset = newRight)
}

object EthFunctions {
  /** keccak256 hex digest of a string/binary column. */
  def keccak256(c: Column): Column = Bridge.column(KeccakHash(expr(c)))

  /** little-endian u64 at byte offset (for ABI-ish payload decode). */
  def le_u64(bytes: Column, offset: Column): Column =
    Bridge.column(LeU64(expr(bytes), expr(offset)))

  /** topic hash of an event signature string — the P3 signature match. */
  def eventTopic(signature: String): Column = {
    import org.apache.spark.sql.functions.lit
    keccak256(lit(signature))
  }

  private def expr(c: Column): Expression = Bridge.expression(c)

  /** SQL-callable (name, builder) pairs — consumed per-session by
    * [[registerAll]] and fleet-wide by
    * [[graft.plans.GraftExtensions]]'s `injectFunction`.
    */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "keccak256" -> (es => KeccakHash(es.head)),
    "le_u64" -> (es => LeU64(es(0), es(1))))

  /** Make the custom expressions SQL-callable in a session:
    * `SELECT keccak256(s), le_u64(data, 0) FROM …`.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }
}
