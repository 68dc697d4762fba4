package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Declarative similarity joins as a Catalyst OPTIMIZER REWRITE.
  *
  * A user who writes the obvious thing —
  * {{{
  *   a.join(b, SimJoin.hamming64($"fp_a", $"fp_b") <= 4)
  * }}}
  * — hands Spark a join with no equality conjunct, and the planner's only
  * physical options are BroadcastNestedLoopJoin / CartesianProduct:
  * O(|a|·|b|) comparisons, the exact quadratic blow-up every banded tier
  * in `graft.ext` exists to avoid. At 100 TB that plan never finishes.
  *
  * [[SimJoinRewrite]] pattern-matches `bit_count(fpA ^ fpB) <= d` (any
  * conjunct position, either comparison orientation, `<`/`<=`/`>=`/`>`
  * with the literal on either side) in the condition of an inner/cross
  * join with no existing inter-side equality conjunct, and rewrites to
  * the pigeonhole-banded plan the hand-built tiers use
  * ([[graft.ext.Multimodal.nearDupMedia]], `Dedup.simHashPairs`):
  *
  *  - split the 64 fingerprint bits into `d+1` disjoint bands (Hamming
  *    distance ≤ d ⇒ the two fingerprints agree on AT LEAST one band —
  *    the pigeonhole blocking guarantee, zero recall loss);
  *  - posexplode each side's band values and equi-join on
  *    (band index, band value) — a shuffle hash/sort-merge join on a
  *    16-byte key, never a nested loop;
  *  - keep each qualifying pair EXACTLY ONCE without any distinct-style
  *    re-shuffle: a pair agreeing on m bands would match m times, so a
  *    post-join predicate keeps only the FIRST agreeing band
  *    (`first_match_band(fpA, fpB) = band_idx`, a plain CaseWhen over
  *    the recomputed per-band equalities — evaluated per matched row,
  *    no extra exchange);
  *  - re-apply the original Hamming predicate (banding is a blocking
  *    guarantee, not a distance test) plus every other conjunct, and
  *    project back to the original output attributes.
  *
  * The rewritten plan is semantically IDENTICAL to the nested-loop form —
  * same multiset of output rows, null fingerprints dropping out in both
  * (null band values never satisfy an equi-join; `bit_count(null ^ x)`
  * never satisfies the filter) — it is purely a physical-shape win:
  * candidate pairs ∝ Σ per-bucket n², not n·m (SimJoinRewriteSpec pins
  * multiset equality on a duplicate-bearing corpus and asserts the
  * executed plan carries no nested-loop/cartesian operator).
  *
  * Install on a driver-owned session via [[SimJoin.install]]
  * (`spark.experimental.extraOptimizations` — the session-local hook for
  * a library that does not control session construction), or fleet-wide
  * with `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * ([[GraftExtensions]], the `SparkSessionExtensions` injection point).
  * The rule is a no-op on every plan it does not fully recognize: joins
  * that already have an equality conjunct (hash-joinable as-is — also
  * what makes the rewrite's own output, which contains band equalities,
  * terminal under the optimizer's fixed-point driver), non-long
  * fingerprint types, non-deterministic fingerprint expressions,
  * thresholds that make the predicate vacuous (d ≥ 64) or empty (d < 0).
  */
object SimJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** A recognized `hamming(fpA, fpB) <= d` conjunct, fp sides already
    * oriented as (left-side expression, right-side expression).
    */
  private case class HammingPred(fpL: Expression, fpR: Expression, d: Int)

  private def asLongLit(e: Expression): Option[Long] = e match {
    case Literal(v: Number, org.apache.spark.sql.types.ByteType |
        org.apache.spark.sql.types.ShortType | IntegerType | LongType) =>
      Some(v.longValue())
    case _ => None
  }

  /** Normalize any orientation of the comparison to `hamming <= d`. */
  private def asHammingLe(e: Expression): Option[(Expression, Expression, Long)] = {
    def bc(e: Expression): Option[(Expression, Expression)] = e match {
      case BitwiseCount(BitwiseXor(a, b)) => Some((a, b))
      // a long/short literal on the other side makes the analyzer wrap
      // the (integer) bit_count in a widening cast — still the same
      // predicate
      case Cast(BitwiseCount(BitwiseXor(a, b)), t, _, _)
          if t == LongType || t == IntegerType => Some((a, b))
      case _ => None
    }
    e match {
      case LessThanOrEqual(l, r) =>
        for { (a, b) <- bc(l); d <- asLongLit(r) } yield (a, b, d)
      case LessThan(l, r) =>
        for { (a, b) <- bc(l); d <- asLongLit(r) } yield (a, b, d - 1)
      case GreaterThanOrEqual(l, r) =>
        for { (a, b) <- bc(r); d <- asLongLit(l) } yield (a, b, d)
      case GreaterThan(l, r) =>
        for { (a, b) <- bc(r); d <- asLongLit(l) } yield (a, b, d - 1)
      case _ => None
    }
  }

  /** Orient (a, b) so the first element references only `left` and the
    * second only `right`; None when either straddles both sides.
    */
  private def orient(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression)] = {
    def onlyIn(e: Expression, p: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (onlyIn(a, left) && onlyIn(b, right)) Some((a, b))
    else if (onlyIn(b, left) && onlyIn(a, right)) Some((b, a))
    else None
  }

  private def findHamming(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(HammingPred, Seq[Expression])] =
    conjuncts.zipWithIndex.collectFirst(Function.unlift { case (c, i) =>
      for {
        (a, b, d) <- asHammingLe(c)
        if a.dataType == LongType && b.dataType == LongType
        if a.deterministic && b.deterministic
        if d >= 0 && d < 64
        (fpL, fpR) <- orient(a, b, left, right)
      } yield (HammingPred(fpL, fpR, d.toInt),
        conjuncts.patch(i, Nil, 1))
    })

  /** An existing inter-side equality conjunct means the join is already
    * hash-joinable — leave it alone (and guarantee fixed-point
    * termination, since the rewritten join always carries one).
    */
  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case Equality(l, r) =>
        (l.references.subsetOf(left.outputSet) &&
          r.references.subsetOf(right.outputSet) && l.references.nonEmpty &&
          r.references.nonEmpty) ||
        (r.references.subsetOf(left.outputSet) &&
          l.references.subsetOf(right.outputSet) && l.references.nonEmpty &&
          r.references.nonEmpty)
      case _ => false
    }

  /** Band boundaries: 64 bits split into `bands` contiguous groups, the
    * first `64 % bands` groups one bit wider.
    */
  private def bandRanges(bands: Int): Seq[(Int, Int)] = {
    val base = 64 / bands
    val rem = 64 % bands
    val widths = (0 until bands).map(i => base + (if (i < rem) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  private def bandVal(fp: Expression, from: Int, width: Int): Expression = {
    val shifted = ShiftRightUnsigned(fp, Literal(from))
    if (width == 64) shifted
    else BitwiseAnd(shifted, Literal((1L << width) - 1L))
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKey(conjuncts, left, right)) j
      else findHamming(conjuncts, left, right) match {
        case None => j
        case Some((hp, rest)) =>
          val bands = hp.d + 1
          val ranges = bandRanges(bands)
          def explodeSide(child: LogicalPlan, fp: Expression,
              tag: String): (LogicalPlan, Attribute, Attribute) = {
            val vals = CreateArray(ranges.map { case (from, w) =>
              bandVal(fp, from, w)
            })
            val idx = AttributeReference(s"__simjoin_idx_$tag", IntegerType,
              nullable = false)()
            val v = AttributeReference(s"__simjoin_val_$tag", LongType,
              nullable = fp.nullable)()
            (Generate(PosExplode(vals), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(idx, v), child = child), idx, v)
          }
          val (genL, idxL, valL) = explodeSide(left, hp.fpL, "l")
          val (genR, idxR, valR) = explodeSide(right, hp.fpR, "r")
          // exactly-once: keep the FIRST band the two fingerprints agree
          // on — a CaseWhen over the recomputed band equalities, compared
          // to this row's band index. No distinct, no extra exchange.
          val firstMatch = CaseWhen(
            ranges.zipWithIndex.map { case ((from, w), i) =>
              (EqualTo(bandVal(hp.fpL, from, w), bandVal(hp.fpR, from, w)),
                Literal(i)): (Expression, Expression)
            },
            None)
          val hamming = LessThanOrEqual(
            BitwiseCount(BitwiseXor(hp.fpL, hp.fpR)), Literal(hp.d))
          val newCond = (Seq(
            EqualTo(idxL, idxR),
            EqualTo(valL, valR),
            EqualTo(firstMatch, idxL),
            hamming) ++ rest).reduce(And)
          Project(j.output,
            Join(genL, genR, Inner, Some(newCond), hint))
      }
  }
}

/** `spark.sql.extensions`-style injection point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` installs the
  * two optimizer rewrites AND the library's whole SQL function surface
  * (keccak/minhash/simhash/winnow/dict/nfc/vec families) on every session
  * of the deployment — a pure-SQL user gets the full engine without
  * calling any per-module `registerAll` (the reference's extension surface
  * reaching SQL, `README.md:95-104`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SimJoinRewrite)
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    // consumes `df.hint("range_join", w)` BEFORE the analyzer drops
    // unknown hints — per-join bin widths for the range rewrites
    e.injectHintResolutionRule(_ => RangeJoinHint)
    GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
    // table-valued surface: the transactional table's time-travel, CDC
    // and history reads from pure SQL (Delta's table_changes TVF shape)
    GraftExtensions.tableFunctions.foreach { case (name, builder) =>
      e.injectTableFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}

object GraftExtensions {
  /** The library's complete SQL function registry — one list shared by the
    * fleet-wide injection above and each module's per-session
    * `registerAll`.
    */
  def sqlFunctions: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] =
    graft.functions.EthFunctions.sqlBuilders ++
      graft.functions.MinHash.sqlBuilders ++
      graft.functions.DictMatch.sqlBuilders ++
      graft.functions.TextNorm.sqlBuilders ++
      graft.functions.VectorFunctions.sqlBuilders

  /** Table-valued functions over [[graft.store.TxLogTable]] — the SQL
    * face of the transactional store (Delta's `table_changes` shape):
    *
    *  - `tx_table_at(root, filter_hash, version)`    — VERSION AS OF
    *  - `tx_table_at_time(root, filter_hash, millis)` — TIMESTAMP AS OF
    *  - `tx_table_changes(root, filter_hash, from, to)` — the change feed
    *  - `tx_table_history(root, filter_hash)`        — DESCRIBE HISTORY
    *
    * Arguments must be FOLDABLE (they select a TABLE, so they are
    * resolution-time inputs, not row data) — literals, constant
    * arithmetic (`1 + 1`), constant function calls (`concat(root, '/x')`)
    * and session variables all qualify: the builder resolves each
    * argument against a one-row plan first, so expressions that arrive
    * unresolved from the parser (function calls, variable references)
    * fold cleanly instead of erroring. The builder runs during analysis
    * on the driver with the querying session active, so the produced
    * plan is exactly the DataFrame API's plan — pushed-down index ranges
    * and all.
    */
  def tableFunctions: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    // TVF arguments arrive as PARSED trees: a bare literal is resolved,
    // but `concat('a','b')` is an UnresolvedFunction (whose `.foldable`
    // throws) and a session variable is an unresolved reference — resolve
    // them the way any scalar expression resolves, against OneRowRelation
    // the analyzer hands some pre-resolved arguments wrapped in an Alias
    // (session variables resolve to `variablereference(...) AS name`),
    // and Alias.foldable is unconditionally false — unwrap to the child
    def stripAlias(e: Expression): Expression = e match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        stripAlias(a.child)
      case other => other
    }
    def resolvedArg(fn: String, args: Seq[Expression], i: Int): Expression = {
      val e = stripAlias(args(i))
      if (e.resolved) e
      else try {
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.{OneRowRelation, Project}
        org.apache.spark.sql.SparkSession.active.sessionState.analyzer
          .execute(Project(Seq(Alias(e, "v")()), OneRowRelation()))
          .asInstanceOf[Project].projectList.head
          .asInstanceOf[Alias].child match { case r => stripAlias(r) }
      } catch {
        case scala.util.control.NonFatal(ex) =>
          throw new IllegalArgumentException(
            s"$fn: argument ${i + 1} must be a foldable expression " +
              "(no column references)", ex)
      }
    }
    def str(fn: String, args: Seq[Expression], i: Int): String = {
      val e = resolvedArg(fn, args, i)
      require(e.foldable &&
        e.dataType == org.apache.spark.sql.types.StringType,
        s"$fn: argument ${i + 1} must be a foldable string expression")
      e.eval().toString
    }
    def long(fn: String, args: Seq[Expression], i: Int): Long = {
      val e = resolvedArg(fn, args, i)
      require(e.foldable, s"$fn: argument ${i + 1} must be foldable")
      e.eval() match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l
        case other => throw new IllegalArgumentException(
          s"$fn: argument ${i + 1} must be an integer literal, got $other")
      }
    }
    def table(fn: String, args: Seq[Expression]) =
      new graft.store.TxLogTable(
        org.apache.spark.sql.SparkSession.active,
        str(fn, args, 0), str(fn, args, 1))
    def arity(fn: String, args: Seq[Expression], n: Int): Unit =
      require(args.length == n, s"$fn expects $n arguments, got ${args.length}")
    Seq(
      "tx_table_at" -> { args =>
        arity("tx_table_at", args, 3)
        table("tx_table_at", args)
          .readAt(long("tx_table_at", args, 2)).queryExecution.logical
      },
      "tx_table_changes" -> { args =>
        arity("tx_table_changes", args, 4)
        table("tx_table_changes", args)
          .changesBetween(long("tx_table_changes", args, 2),
            long("tx_table_changes", args, 3)).queryExecution.logical
      },
      "tx_table_history" -> { args =>
        arity("tx_table_history", args, 2)
        table("tx_table_history", args).history().queryExecution.logical
      },
      "tx_table_at_time" -> { args =>
        arity("tx_table_at_time", args, 3)
        table("tx_table_at_time", args)
          .readAtTimestamp(long("tx_table_at_time", args, 2))
          .queryExecution.logical
      })
  }
}

object SimJoin {
  /** Hamming distance of two 64-bit fingerprints — the declarative
    * similarity-join predicate [[SimJoinRewrite]] recognizes.
    */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))

  /** Install the rewrite on a driver-owned session (idempotent) — the
    * `extraOptimizations` hook is the session-local equivalent of
    * registering [[GraftExtensions]] at session build time.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(SimJoinRewrite))
      spark.experimental.extraOptimizations = cur :+ SimJoinRewrite
  }
}
