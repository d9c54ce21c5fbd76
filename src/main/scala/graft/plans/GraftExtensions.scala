package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — the
  * standard deployment path on a shared cluster (no code access to the
  * session builder needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.intArg

  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: bounded levenshtein predicates -> banded DP form
    e.injectOptimizerRule(_ => LevenshteinThresholdRule)
    // optimizer rule: keyless bounded time-band joins -> banded
    // equi-join (kills the BroadcastNestedLoopJoin fallback)
    e.injectOptimizerRule(_ => RangeJoinBandingRule)
    // planner strategy: the native sort-merge as-of join exec
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32Expr].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32Expr(children.head)))
    e.injectFunction((
      new FunctionIdentifier("text_normalize"),
      new ExpressionInfo(classOf[TextNormalizeExpr].getName, "text_normalize"),
      (children: Seq[Expression]) => TextNormalizeExpr(children.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSigExpr(children.head,
        intArg("minhash_sig", "numHashes", children(1)))))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimExpr(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (children: Seq[Expression]) => ShinglesExpr(children.head,
        intArg("shingles", "k", children(1)))))
    e.injectFunction((
      new FunctionIdentifier("kmv_lows"),
      new ExpressionInfo(classOf[KmvLowsAgg].getName, "kmv_lows"),
      // bare aggregate — the analyzer wraps it in AggregateExpression
      (children: Seq[Expression]) => KmvLowsAgg(children.head,
        intArg("kmv_lows", "k", children(1)))))
  }
}

object GraftExtensions {
  /** Foldable integer argument of a SQL-registered function — accepts
    * INT or BIGINT literals and names the function/argument on error
    * (a bare asInstanceOf would throw an anonymous ClassCastException
    * for BIGINT and unbox NULL to 0).
    */
  private[plans] def intArg(fn: String, arg: String, e: Expression): Int =
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long
        if l >= Int.MinValue && l <= Int.MaxValue => l.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn($arg) needs a non-null integer literal, got: " +
          Option(other).map(_.toString).getOrElse("NULL"))
    }
}
