package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: band every Levenshtein threshold filter with its
  * free length guard.
  *
  *   `levenshtein(a, b) <= k`  ⇒  `abs(length(a) − length(b)) <= k AND
  *                                 levenshtein(a, b) <= k`
  *
  * and likewise for `<`, for the literal-first spellings (`k >= lev`,
  * `k > lev`), and for EQUALITY (`levenshtein(a, b) = k` implies the
  * same `<= k` length bound — VERDICT r7 #3b).
  *
  * Sound by the edit-distance lower bound lev(a,b) ≥ |len(a) − len(b)|
  * (every insert/delete changes the length by one, substitutions by
  * zero) — the added conjunct is implied, so results are bit-identical
  * on every plan (the 220-query oracle gate runs with this rule active).
  * Useful because the guard is two codegen'd length reads and a
  * compare, while the DP it short-circuits is O(|a|·|b|) per row —
  * exactly the prefilter the similarity-join literature applies by hand
  * (q166's bag filter is the stronger cousin) but which users writing
  * plain `WHERE levenshtein(a, b) <= 2` never get. Catalyst itself has
  * no such rewrite; this is the §7.3(c) extension path
  * (`SparkSessionExtensions.injectOptimizerRule`, see
  * [[graft.GraftExtensions]]).
  *
  * Runs in the user-provided fixed-point batch, so it must be
  * idempotent. The already-guarded check keys on the FULL guard shape —
  * both length operands plus the threshold (r7 ADVICE: keying on a
  * single column let an unrelated `abs(length(a) − x) <= k` predicate
  * suppress banding of `lev(a, b) <= k`). Each operand key is the
  * column under `length(...)` for non-foldable operands and the
  * EVALUATED length literal for foldable ones — the same key whether
  * the guard is still in its freshly-built `length('lit')` form (the
  * user batch iterates without ConstantFolding) or already folded to an
  * int literal (AQE re-optimizes fragments of the folded plan), so the
  * rule neither loops in the former state nor re-adds in the latter.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def bandGuard(a: Expression, b: Expression, k: Expression,
                        strict: Boolean): Expression = {
    val diff = Abs(Subtract(Length(a), Length(b)))
    if (strict) LessThan(diff, k) else LessThanOrEqual(diff, k)
  }

  /** Key of one side of an existing guard's `Subtract`. */
  private def guardSideKey(x: Expression): Option[Expression] = x match {
    case Length(c) if !c.foldable => Some(c.canonicalized)
    case e if e.foldable =>
      scala.util.Try(Literal(e.eval()).canonicalized).toOption
    case other => Some(other.canonicalized)
  }

  /** Key of one operand of a candidate `levenshtein(a, b)`. */
  private def candSideKey(a: Expression): Option[Expression] =
    if (!a.foldable) Some(a.canonicalized)
    else scala.util.Try(Literal(Length(a).eval()).canonicalized).toOption

  /** Full-shape guards already present anywhere in `cond`: (operand key
    * pair, threshold, strictness).
    */
  private def guardedKeys(
      cond: Expression): Set[(Set[Expression], Expression, Boolean)] =
    cond.collect {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), k) =>
        for (kx <- guardSideKey(x); ky <- guardSideKey(y))
          yield (Set(kx, ky), k.canonicalized, false)
      case LessThan(Abs(Subtract(x, y, _), _), k) =>
        for (kx <- guardSideKey(x); ky <- guardSideKey(y))
          yield (Set(kx, ky), k.canonicalized, true)
    }.flatten.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Filter AND Join conditions: predicate pushdown turns a
    // post-join `.filter(lev(a_x, b_x) <= 2)` into the join condition
    // itself (exactly the shape of q166/q175's exact-scoring stage), so
    // a Filter-only rule would miss the places the guard matters most.
    case f @ Filter(cond, _) =>
      val rewritten = band(cond)
      if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = band(cond)
      if (rewritten.fastEquals(cond)) j else j.copy(condition = Some(rewritten))
  }

  private def band(cond: Expression): Expression = {
      val existing = guardedKeys(cond)
      def banded(a: Expression, b: Expression, k: Expression,
                 strict: Boolean): Boolean =
        (candSideKey(a), candSideKey(b)) match {
          case (Some(ka), Some(kb)) =>
            existing.contains((Set(ka, kb), k.canonicalized, strict))
          case _ => true // no stable key (odd operand): leave untouched
        }
      def intLit(k: Expression): Boolean =
        k.foldable && k.dataType == IntegerType
      val rewritten = cond.transformUp {
        case le @ LessThanOrEqual(Levenshtein(a, b, None), k)
            if intLit(k) && !banded(a, b, k, strict = false) =>
          And(bandGuard(a, b, k, strict = false), le)
        case lt @ LessThan(Levenshtein(a, b, None), k)
            if intLit(k) && !banded(a, b, k, strict = true) =>
          // lev < k ⟹ |Δlen| < k
          And(bandGuard(a, b, k, strict = true), lt)
        case ge @ GreaterThanOrEqual(k, Levenshtein(a, b, None))
            if intLit(k) && !banded(a, b, k, strict = false) =>
          And(bandGuard(a, b, k, strict = false), ge)
        case gt @ GreaterThan(k, Levenshtein(a, b, None))
            if intLit(k) && !banded(a, b, k, strict = true) =>
          And(bandGuard(a, b, k, strict = true), gt)
        case eq @ EqualTo(Levenshtein(a, b, None), k)
            if intLit(k) && !banded(a, b, k, strict = false) =>
          // lev = k ⟹ |Δlen| <= k
          And(bandGuard(a, b, k, strict = false), eq)
        case eq @ EqualTo(k, Levenshtein(a, b, None))
            if intLit(k) && !banded(a, b, k, strict = false) =>
          And(bandGuard(a, b, k, strict = false), eq)
      }
      rewritten
  }
}
