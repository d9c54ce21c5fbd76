package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (Winkler 1990; the record-linkage
  * standard for short name fields, complementing Levenshtein's
  * edit-count view with a match/transposition one). Spark has no
  * built-in; a Scala UDF would box both strings per row — this is a
  * tight two-pass primitive loop over the UTF-8 bytes with two small
  * boolean scratch arrays, `CodegenFallback` keeping the surrounding
  * operators inside whole-stage codegen (same pattern as
  * [[CosineSimExpr]]).
  *
  * Portable definition (matches DuckDB's `jaro_winkler_similarity`,
  * byte-oriented, verified against its outputs):
  *  - match window `max(|a|,|b|)/2 − 1` (floor, min 0), each byte of
  *    `a` matches the nearest unmatched equal byte of `b` in window;
  *  - `jaro = (m/|a| + m/|b| + (m−t)/m) / 3`, `t` = half the
  *    out-of-order matched positions; 0 matches → 0;
  *  - Winkler boost only when `jaro > 0.7`:
  *    `jw = jaro + min(ℓ,4)·0.1·(1−jaro)` with ℓ the common prefix.
  * Byte orientation = codepoint orientation on ASCII fields (names,
  * codes — the intended domain).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs (string, string), got " +
        s"${left.dataType.simpleString(100)}, ${right.dataType.simpleString(100)}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  private[graft] def similarity(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length; val lb = b.length
    // DuckDB scores ANY empty side 0 — including empty vs empty
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) { // pass 1: greedy nearest-unmatched in window
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t2 = 0 // pass 2: out-of-order matched positions (2·transpositions)
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) t2 += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    // `t2 / 2` is deliberate INTEGER division: an odd out-of-order
    // count floors (2 transposition-halves → 1, 3 → 1), matching
    // DuckDB's jaro_winkler_similarity bit-for-bit (probe-pinned in
    // FuzzyJoinSpec) rather than the textbook 0.5-granular
    // half-transposition count — a deliberate oracle-compat choice
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val lim = math.min(4, math.min(la, lb))
      while (l < lim && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column API. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT jaro_winkler(a, b) FROM …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinklerExpr(exprs(0), exprs(1)), "scala_udf")
}
