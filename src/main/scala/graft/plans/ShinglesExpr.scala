package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word k-gram shingling — one pass over
  * the token array, each k-window joined with a single space.
  *
  * Value-identical to the declarative formulation kept in
  * [[graft.functions.TextShingles.shinglesDeclarative]] (spec-pinned):
  * `n <= k` collapses the whole text into one shingle, and `concat_ws`
  * null-skipping is preserved via `UTF8String.concatWs`. The declarative
  * version has a quadratic trap: `slice(tokens, i, k)` sits inside a
  * `transform` lambda, and higher-order functions re-evaluate the
  * captured `tokens` expression (a regex split of the full text) for
  * every output element — O(tokens²) regex work per document. This
  * expression evaluates the token array exactly once.
  *
  * `CodegenFallback` keeps surrounding operators inside whole-stage
  * codegen; the window join dominates the eval cost.
  */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles needs array<string>, got ${other.simpleString(100)}")
    }

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (n <= k) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, toks: _*)))
    } else {
      val out = new Array[Any](n - k + 1)
      val window = new Array[UTF8String](k)
      i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) { window(j) = toks(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, window: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  /** Column API. */
  def shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(tokens), k))

  /** SQL registration: `shingles(tokens, k)` with a literal `k`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles", exprs => ShinglesExpr(exprs.head,
        GraftExtensions.intArg("shingles", "k", exprs(1))), "scala_udf")
}
