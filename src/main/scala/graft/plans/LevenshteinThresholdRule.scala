package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite bounded-edit-distance predicates into
  * Spark's banded threshold form —
  * `levenshtein(a, b) <= k  ⇒  levenshtein(a, b, k) >= 0`
  * (and the `<` / reversed-operand variants). The threshold form runs
  * the Ukkonen banded DP: O(k·min(m,n)) instead of O(m·n), plus an
  * O(1) length-difference early-out — on a fuzzy-join verify stage
  * this is the difference between touching every cell of every
  * candidate pair and touching a 2k+1 band.
  *
  * [[graft.operators.FuzzyJoin]] applies the threshold form by hand;
  * this rule extends the same optimization to AD-HOC user SQL (the
  * analyst writing `WHERE levenshtein(name_a, name_b) <= 2` on a
  * 100 TB join gets the banded DP without knowing it exists).
  *
  * Semantics are preserved exactly: with threshold k the expression
  * returns the distance when ≤ k and −1 otherwise, so `>= 0` is
  * precisely the original predicate; NULL inputs stay NULL through
  * both forms. The match requires threshold=None, so the rule is
  * idempotent under the optimizer's fixed-point loop. Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`).
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(i: Int, IntegerType) => Some(i)
    case Literal(l: Long, LongType)
      if l >= Int.MinValue && l <= Int.MaxValue => Some(l.toInt)
    case _ => None
  }

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), lit)
        if intLit(lit).exists(_ >= 0) => banded(a, b, intLit(lit).get)
      case GreaterThanOrEqual(lit, Levenshtein(a, b, None))
        if intLit(lit).exists(_ >= 0) => banded(a, b, intLit(lit).get)
      case LessThan(Levenshtein(a, b, None), lit)
        if intLit(lit).exists(_ >= 1) => banded(a, b, intLit(lit).get - 1)
      case GreaterThan(lit, Levenshtein(a, b, None))
        if intLit(lit).exists(_ >= 1) => banded(a, b, intLit(lit).get - 1)
    }
}
