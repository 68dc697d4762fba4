package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Multi-pattern dictionary matching for corpus filtering/tagging — the
  * blocklist / keyword / phrase-PII pass of a curation pipeline.
  *
  * Why not a regex alternation (`rlike("(a|b|c|…)")`)? Java's regex engine
  * compiles alternations into alternatives tried per position — cost grows
  * with the DICTIONARY size, and real blocklists carry 10⁴–10⁶ phrases.
  * The Aho–Corasick automaton (1975) matches ALL terms in one left-to-right
  * pass, O(|text| + matches), independent of dictionary size: the classic
  * FlashText argument, here as a Catalyst expression so the scan stays a
  * narrow codegen'd pass with the automaton riding along as a
  * plan-constant reference object (built once per plan, shared by every
  * row — never per-row work).
  *
  * Matching semantics: case-sensitive substring matches; a match is
  * counted at every END position of every term (the standard AC contract —
  * overlapping matches of different terms all count; a self-overlapping
  * term like "aa" in "aaa" counts twice). [[DictMatchCount]] returns the
  * total count; [[DictMatchTerms]] returns the DISTINCT matched terms
  * (sorted), the per-doc tag set.
  */
private[functions] final class AhoCorasick(terms: Seq[String])
    extends Serializable {
  // trie over chars: goto maps, fail links, and per-node output counts
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
  private val termIdx = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  terms.zipWithIndex.foreach { case (t, ti) =>
    var node = 0
    t.foreach { ch =>
      node = gotoMaps(node).getOrElseUpdate(ch, {
        gotoMaps += scala.collection.mutable.Map.empty[Char, Int]
        termIdx += Nil
        gotoMaps.length - 1
      })
    }
    if (t.nonEmpty) termIdx(node) = ti :: termIdx(node)
  }

  private val fail = new Array[Int](gotoMaps.length)
  // outputs(node) = term indices ending at node (incl. via fail chain)
  private val outputs: Array[Array[Int]] = {
    val out = termIdx.map(_.toArray).toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoMaps(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        fail(v) = if (gotoMaps(f).contains(ch) && gotoMaps(f)(ch) != v)
          gotoMaps(f)(ch) else 0
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
    out
  }

  private val termArr = terms.toArray

  // terminal(node) = a term ends exactly at this node via the direct trie
  // path (NOT through fail links) — what leftmost-longest scanning needs
  private val terminal: Array[Boolean] = termIdx.map(_.nonEmpty).toArray

  /** Single-pass LEFTMOST-LONGEST redaction: at each position take the
    * longest dictionary term starting there (plain trie walk, no fail
    * links), emit `repl` and jump past it; else copy the char. The
    * lexer-style contract every redaction pass wants — "she" under
    * {he, she} scrubs once as "she", never leaves "s" behind.
    */
  def scrub(text: String, repl: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      var node = 0
      var j = i
      var lastEnd = -1
      var walking = true
      while (walking && j < text.length) {
        gotoMaps(node).get(text.charAt(j)) match {
          case Some(next) =>
            node = next; j += 1
            if (terminal(node)) lastEnd = j
          case None => walking = false
        }
      }
      if (lastEnd > 0) { sb.append(repl); i = lastEnd }
      else { sb.append(text.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Total match count across all terms and positions. */
  def countAll(text: String): Long = {
    var node = 0
    var count = 0L
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !gotoMaps(node).contains(ch)) node = fail(node)
      node = gotoMaps(node).getOrElse(ch, 0)
      count += outputs(node).length
      i += 1
    }
    count
  }

  /** Sorted distinct matched terms. */
  def matchedTerms(text: String): Array[String] = {
    val seen = new java.util.TreeSet[String]()
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !gotoMaps(node).contains(ch)) node = fail(node)
      node = gotoMaps(node).getOrElse(ch, 0)
      outputs(node).foreach(t => seen.add(termArr(t)))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }
}

/** Total Aho–Corasick match count of a fixed dictionary in a string. */
case class DictMatchCount(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "dictionary must be non-empty terms")

  @transient private lazy val ac = new AhoCorasick(terms)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dict_match_count expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    ac.countAll(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("ahoCorasick", ac,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $ref.countAll($v.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): DictMatchCount =
    copy(child = newChild)
}

/** Sorted distinct dictionary terms matched in a string — the per-doc
  * tag set for dictionary-driven routing/filtering.
  */
case class DictMatchTerms(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "dictionary must be non-empty terms")

  @transient private lazy val ac = new AhoCorasick(terms)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dict_match_terms expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val matched = ac.matchedTerms(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      matched.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)
        .asInstanceOf[Any]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("ahoCorasick", ac,
        classOf[AhoCorasick].getName)
      val arr = ctx.freshName("matched")
      val i = ctx.freshName("i")
      val conv = ctx.freshName("conv")
      s"""
         |java.lang.String[] $arr = $ref.matchedTerms($v.toString());
         |Object[] $conv = new Object[$arr.length];
         |for (int $i = 0; $i < $arr.length; $i++) {
         |  $conv[$i] =
         |    org.apache.spark.unsafe.types.UTF8String.fromString($arr[$i]);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($conv);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DictMatchTerms =
    copy(child = newChild)
}

/** Leftmost-longest dictionary redaction: every dictionary match replaced
  * by `repl` in one trie pass (see [[AhoCorasick.scrub]]).
  */
case class DictScrub(child: Expression, terms: Seq[String], repl: String)
    extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "dictionary must be non-empty terms")

  @transient private lazy val ac = new AhoCorasick(terms)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dict_scrub expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      ac.scrub(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString, repl))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("ahoCorasick", ac,
        classOf[AhoCorasick].getName)
      val r = ctx.addReferenceObj("scrubRepl", repl, "java.lang.String")
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $ref.scrub($v.toString(), $r));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DictScrub =
    copy(child = newChild)
}

object DictMatch {
  /** Total AC match count of `terms` in a string column (codegen'd). */
  def count(text: Column, terms: Seq[String]): Column =
    Bridge.column(DictMatchCount(Bridge.expression(text), terms))

  /** Leftmost-longest redaction of `dict` matches by `repl` (codegen'd). */
  def scrub(text: Column, dict: Seq[String], repl: String): Column =
    Bridge.column(DictScrub(Bridge.expression(text), dict, repl))

  /** Sorted distinct matched terms (codegen'd). */
  def terms(text: Column, dict: Seq[String]): Column =
    Bridge.column(DictMatchTerms(Bridge.expression(text), dict))

  private def litStrings(e: Expression): Seq[String] = e.eval() match {
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      a.toObjectArray(StringType).map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"dictionary must be a string-array literal, got $other")
  }

  /** SQL-callable registration: `dict_match_count(text, array('a','b'))`,
    * `dict_match_terms(text, array(…))` — the dictionary must be a
    * literal (it builds the plan-constant automaton).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }

  /** SQL-callable (name, builder) pairs — consumed per-session by
    * [[registerAll]] and fleet-wide by
    * [[graft.plans.GraftExtensions]]'s `injectFunction`.
    */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dict_match_count" -> (es => DictMatchCount(es.head, litStrings(es(1)))),
    "dict_match_terms" -> (es => DictMatchTerms(es.head, litStrings(es(1)))),
    "dict_scrub" -> (es => DictScrub(es.head, litStrings(es(1)),
      litString(es(2)))))

  private def litString(e: Expression): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(
      s"replacement must be a string literal, got $other")
  }
}
