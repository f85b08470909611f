package graft.plans

import graft.llm.JaccardExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: band every Jaccard threshold filter with its free
  * size-ratio guard (VERDICT r7 #3a — the positional-filter prefilter
  * of the set-similarity-join literature, applied automatically):
  *
  *   `jaccard_sim(a, b) >= t`  ⇒
  *   `size(a) >= ts·size(b) AND size(b) >= ts·size(a) AND <original>`
  *
  * and likewise for `>` and the literal-first spellings. Soundness: for
  * sets, J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|) (the intersection is at
  * most the smaller set, the union at least the larger), so J ≥ t
  * forces both size ratios ≥ t. The guard threshold is SLACKENED to
  * ts = t − 1e-9: [[JaccardExpr]] returns a double whose division
  * rounding sits within 2⁻⁵² of the exact rational, and the guard's own
  * `ts·size` product rounds within ulp(2³¹) < 5e-7 of exact — the 1e-9
  * slack dominates both, so floating-point can never make the implied
  * conjunct reject a row the exact predicate keeps (it only weakens
  * pruning immeasurably). The guard reads two array headers instead of
  * hashing every element — on selective thresholds it short-circuits
  * the O(|a|+|b|) set build the same way the Levenshtein length band
  * short-circuits the DP.
  *
  * SOUNDNESS PRECONDITION — set-valued operands. [[JaccardExpr]] is a
  * SET similarity (it deduplicates), while `size(x)` counts RAW
  * elements; with duplicates present the raw count overstates the set
  * size and the implied ratio bound breaks (toks = ['x','x','x'] vs
  * ['x']: J = 1 but raw ratio 1/3 — a guard on raw sizes would drop a
  * qualifying row). The rule therefore fires ONLY when BOTH operands
  * are PROVABLY duplicate-free in the plan: a dedup-by-construction
  * expression (`array_distinct`, `array_union/intersect/except`,
  * `map_keys`, `collect_set`, strictly-monotonic `sequence`, a
  * distinct-mode `ShinglesExpr`), an order-only wrapper over one
  * (`sort_array`, `reverse`, casts), a foldable array whose evaluated
  * elements are pairwise distinct — or an ATTRIBUTE whose defining
  * alias (resolved through the plan's Project/Aggregate lists, chased
  * through alias-of-alias chains) is any of those. The lineage walk
  * matters because by the time the predicate sits in a Filter/Join
  * condition, pushdown has usually reduced the operands to bare
  * attributes whose `array_distinct(...)` definition lives in a
  * Project below. An attribute with no visible definition (a scan
  * column, a union output) is conservatively NOT banded — a missed
  * optimization, never a wrong row.
  *
  * Idempotence mirrors [[LevenshteinBandRule]]: guards are keyed on the
  * full shape (both size operands + slackened threshold), with foldable
  * sides keyed by their EVALUATED values so the key is identical
  * whether the guard is freshly built (`size(array(...))` unfolded —
  * the user batch iterates without ConstantFolding) or already folded
  * to a literal (AQE re-optimizes folded fragments). Fires only when at
  * least one array side is non-foldable (a both-literal predicate folds
  * away entirely on its own) and t > 1e-6 (below that the guard prunes
  * nothing).
  */
object JaccardSizeRatioRule extends Rule[LogicalPlan] {

  private val Slack = 1e-9

  /** Whether `e` is duplicate-free BY CONSTRUCTION (see class doc) —
    * the precondition making raw `size()` equal set size, without which
    * the ratio guard is unsound. `defs` maps attribute exprIds to their
    * defining alias children (Project/Aggregate lists anywhere in the
    * plan — exprIds are plan-unique, so one global map is sound); the
    * depth bound caps alias-chain chasing (chains are short; the bound
    * only guards against pathological plans).
    */
  private def provablyDistinct(e: Expression,
                               defs: Map[ExprId, Expression],
                               depth: Int = 0): Boolean =
    if (depth > 20) false else provablyDistinct0(e, defs, depth)

  private def provablyDistinct0(e: Expression,
                                defs: Map[ExprId, Expression],
                                depth: Int): Boolean = e match {
    case a: AttributeReference =>
      defs.get(a.exprId).exists(provablyDistinct(_, defs, depth + 1))
    case al: Alias => provablyDistinct(al.child, defs, depth + 1)
    case _: ArrayDistinct => true
    case _: ArrayUnion => true     // these three return results
    case _: ArrayIntersect => true // "without duplicates" by contract
    case _: ArrayExcept => true
    case _: MapKeys => true
    case _: Sequence => true // strictly monotonic by contract
    case ae: aggregate.AggregateExpression =>
      ae.aggregateFunction.isInstanceOf[aggregate.CollectSet]
    case sh: graft.llm.ShinglesExpr => sh.distinct
    case SortArray(c, _) => provablyDistinct(c, defs, depth + 1)
    case Reverse(c) => provablyDistinct(c, defs, depth + 1)
    // a cast preserves distinctness only when element conversion is
    // INJECTIVE — canUpCast casts are lossless by contract; a narrowing
    // cast (array<double> → array<int>) can collapse distinct elements
    case c @ Cast(ch, _, _, _) =>
      ((ch.dataType, c.dataType) match {
        case (org.apache.spark.sql.types.ArrayType(f, _),
              org.apache.spark.sql.types.ArrayType(t, _)) =>
          f == t || Cast.canUpCast(f, t)
        case _ => false
      }) && provablyDistinct(ch, defs, depth + 1)
    case lit if lit.foldable =>
      scala.util.Try {
        lit.eval() match {
          case null => true // null array: predicate is null either way
          case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
            val et = e.dataType.asInstanceOf[
              org.apache.spark.sql.types.ArrayType].elementType
            val seen = new java.util.HashSet[Any]()
            var nulls = 0
            var ok = true
            var i = 0
            while (i < ad.numElements() && ok) {
              if (ad.isNullAt(i)) { nulls += 1; ok = nulls <= 1 }
              else ok = seen.add(ad.get(i, et))
              i += 1
            }
            ok
          case _ => false
        }
      }.getOrElse(false)
    case _ => false
  }

  private def castSize(e: Expression): Expression =
    Cast(Size(e), DoubleType)

  /** One conjunct: size(x) >= ts · size(y). */
  private def ratioGuard(x: Expression, y: Expression, ts: Double): Expression =
    GreaterThanOrEqual(castSize(x), Multiply(Literal(ts), castSize(y)))

  /** Key of a `cast(size(x) as double)`-shaped guard side. */
  private def sizeKey(x: Expression): Option[Expression] = x match {
    case Cast(Size(c, _), DoubleType, _, _) if !c.foldable =>
      Some(c.canonicalized)
    case e if e.foldable =>
      scala.util.Try(Literal(e.eval()).canonicalized).toOption
    case other => Some(other.canonicalized)
  }

  /** Key of the guard's rhs `ts · size(y)` product (or its folded
    * literal when y is foldable).
    */
  private def rhsKey(r: Expression): Option[(Expression, Expression)] = r match {
    case Multiply(ts: Literal, rest, _) =>
      sizeKey(rest).map(k => (ts.canonicalized, k))
    case e if e.foldable =>
      scala.util.Try(
        (Literal(e.eval()).canonicalized, Literal(true).canonicalized)).toOption
    case _ => None
  }

  private def guardedKeys(
      cond: Expression): Set[(Expression, (Expression, Expression))] =
    cond.collect {
      case GreaterThanOrEqual(l, r) =>
        for (lk <- sizeKey(l); rk <- rhsKey(r)) yield (lk, rk)
    }.flatten.toSet

  /** Expected post-/pre-fold key of the conjunct `size(x) >= ts·size(y)`
    * for candidate operands.
    */
  private def candKey(x: Expression, y: Expression, ts: Double)
      : Option[(Expression, (Expression, Expression))] = {
    def side(e: Expression): Option[Expression] =
      if (!e.foldable) Some(e.canonicalized)
      else scala.util.Try(Literal(castSize(e).eval()).canonicalized).toOption
    val rhs: Option[(Expression, Expression)] =
      if (!y.foldable) side(y).map(k => (Literal(ts).canonicalized, k))
      else scala.util.Try {
        val ny = castSize(y).eval().asInstanceOf[Double]
        (Literal(ts * ny).canonicalized, Literal(true).canonicalized)
      }.toOption
    for (lk <- side(x); rk <- rhs) yield (lk, rk)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // attribute exprId → defining alias child, for the distinctness
    // lineage walk (built lazily: almost every plan has zero jaccard
    // predicates and never pays the collect)
    lazy val defs: Map[ExprId, Expression] = plan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.collect { case a: Alias => a.exprId -> a.child }
      case ag: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        ag.aggregateExpressions.collect { case a: Alias => a.exprId -> a.child }
    }.flatten.toMap
    def hasJaccard(cond: Expression): Boolean =
      cond.exists(_.isInstanceOf[JaccardExpr])
    plan.transform {
      // Filter AND Join conditions — pushdown turns post-join similarity
      // filters (the exact-verify stage of every banded dedup query) into
      // join conditions, where the prefilter matters most.
      case f @ Filter(cond, _) if hasJaccard(cond) =>
        val rewritten = band(cond, defs)
        if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
      case j @ Join(_, _, _, Some(cond), _) if hasJaccard(cond) =>
        val rewritten = band(cond, defs)
        if (rewritten.fastEquals(cond)) j
        else j.copy(condition = Some(rewritten))
    }
  }

  private def band(cond: Expression,
                   defs: Map[ExprId, Expression]): Expression = {
      val existing = guardedKeys(cond)
      def eligible(a: Expression, b: Expression, t: Expression): Boolean =
        t.foldable && t.dataType == DoubleType &&
          !(a.foldable && b.foldable) &&
          provablyDistinct(a, defs) && provablyDistinct(b, defs) &&
          scala.util.Try(t.eval().asInstanceOf[Double]).toOption
            .exists(_ > 1e-6)
      def guard(a: Expression, b: Expression, t: Expression,
                orig: Expression): Expression = {
        val ts = t.eval().asInstanceOf[Double] - Slack
        val missing = Seq((a, b), (b, a)).filter { case (x, y) =>
          !candKey(x, y, ts).exists(existing.contains)
        }
        missing.map { case (x, y) => ratioGuard(x, y, ts) }
          .foldRight(orig)(And(_, _))
      }
      def unguarded(a: Expression, b: Expression, t: Expression): Boolean = {
        val ts = t.eval().asInstanceOf[Double] - Slack
        Seq((a, b), (b, a)).exists { case (x, y) =>
          !candKey(x, y, ts).exists(existing.contains)
        }
      }
      val rewritten = cond.transformUp {
        case ge @ GreaterThanOrEqual(JaccardExpr(a, b), t)
            if eligible(a, b, t) && unguarded(a, b, t) =>
          guard(a, b, t, ge)
        case gt @ GreaterThan(JaccardExpr(a, b), t)
            if eligible(a, b, t) && unguarded(a, b, t) =>
          guard(a, b, t, gt)
        case le @ LessThanOrEqual(t, JaccardExpr(a, b))
            if eligible(a, b, t) && unguarded(a, b, t) =>
          guard(a, b, t, le)
        case lt @ LessThan(t, JaccardExpr(a, b))
            if eligible(a, b, t) && unguarded(a, b, t) =>
          guard(a, b, t, lt)
      }
      rewritten
  }
}
