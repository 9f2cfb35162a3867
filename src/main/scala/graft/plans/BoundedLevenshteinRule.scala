package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite threshold comparisons of the UNBOUNDED
  * levenshtein into the 3-arg banded form.
  *
  *   levenshtein(a, b) <= t   ⇒   levenshtein(a, b, t) >= 0
  *   levenshtein(a, b) <  t   ⇒   levenshtein(a, b, t-1) >= 0
  *
  * The 3-arg form (UTF8String.levenshteinDistance with a threshold)
  * walks only a 2t+1 band of the DP matrix and exits the moment the
  * distance provably exceeds t — O(t·len) instead of O(len²) per pair,
  * and -1-for-beyond-threshold makes `>= 0` the exact containment
  * test. Dedup verify tiers compare candidate pairs against a small
  * cutoff, so the unbounded form wastes almost the whole matrix walk
  * on far pairs; user-written `levenshtein(a,b) <= t` predicates get
  * the banded algorithm without a query rewrite.
  *
  * Only literal non-negative integer thresholds rewrite (a negative t
  * is constant-false anyway; non-literals would re-band per row).
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, t: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(t))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(t: Int, IntegerType))
          if t >= 0 =>
        bounded(a, b, t)
      case LessThan(Levenshtein(a, b, None), Literal(t: Int, IntegerType))
          if t >= 1 =>
        bounded(a, b, t - 1)
      case GreaterThanOrEqual(Literal(t: Int, IntegerType), Levenshtein(a, b, None))
          if t >= 0 =>
        bounded(a, b, t)
      case GreaterThan(Literal(t: Int, IntegerType), Levenshtein(a, b, None))
          if t >= 1 =>
        bounded(a, b, t - 1)
    }
}
