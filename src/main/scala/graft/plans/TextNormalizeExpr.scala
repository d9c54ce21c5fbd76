package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for training-corpus text normalization —
  * the standard cleanup pass before dedup/quality scoring:
  *
  *  1. Unicode NFC normalization (decomposed accents compose, e.g.
  *     `e` + U+0301 → `é`), via `java.text.Normalizer`;
  *  2. C0 control characters and DEL (U+0000–U+001F, U+007F) become
  *     spaces — covers tab/newline/CR plus stray binary junk;
  *  3. runs of ASCII spaces collapse to one (non-ASCII whitespace like
  *     NBSP passes through — it is DATA, the collapse only repairs the
  *     damage step 2 introduced);
  *  4. leading/trailing ASCII spaces trim.
  *
  * One pass, no regex. SQL-replicable exactly:
  * `trim(regexp_replace(regexp_replace(nfc_normalize(x),
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))` (DuckDB).
  *
  * `CodegenFallback` keeps surrounding operators in whole-stage codegen.
  */
case class TextNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_normalize needs string, got ${other.simpleString(100)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = if (c0 < 0x20 || c0 == 0x7f) ' ' else c0
      if (c == ' ') { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c); started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): TextNormalizeExpr =
    copy(child = newChild)
}

object TextNormalizeExpr {
  /** Column API. */
  def textNormalize(text: Column): Column =
    ColumnBridge.column(TextNormalizeExpr(ColumnBridge.expression(text)))

  /** SQL registration: `SELECT text_normalize(text) FROM …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_normalize", exprs => TextNormalizeExpr(exprs.head), "scala_udf")
}
