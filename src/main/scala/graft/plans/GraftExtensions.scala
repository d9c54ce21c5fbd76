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
  override def apply(e: SparkSessionExtensions): Unit = {
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
        children(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimExpr(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (children: Seq[Expression]) => ShinglesExpr(children.head,
        children(1).eval().asInstanceOf[Int])))
  }
}
