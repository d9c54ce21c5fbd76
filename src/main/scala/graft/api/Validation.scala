package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-validity filter + error side channel (reference
  * DbImportWorker.java:1003-1019 collects per-row failures and exports
  * them in the original format, SURVEY §2.3 last row): rows failing any
  * rule go to an `errors` DataFrame with the first failing reason; valid
  * rows continue. One pass, no shuffle.
  */
object Validation {

  case class Validated(valid: DataFrame, errors: DataFrame)

  /** `rules` = (reason, invalid-predicate), evaluated in order — the
    * first matching reason is reported (the reference keeps the first
    * 10 reasons overall; callers can `.limit(10)` the errors side).
    */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): Validated = {
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((r, pred), rest) => when(pred, lit(r)).otherwise(rest)
    }
    val flagged = df.withColumn("__graft_error", reason)
    Validated(
      flagged.filter(col("__graft_error").isNull).drop("__graft_error"),
      flagged.filter(col("__graft_error").isNotNull)
        .withColumnRenamed("__graft_error", "error_reason"))
  }

  /** Re-export erroneous rows in the original (CSV) source format —
    * the `<timestamp>.errors` file analog.
    */
  def exportErrorsCsv(errors: DataFrame, path: String, separator: String = ";"): Unit =
    errors.write.mode("overwrite")
      .option("sep", separator).option("header", "true").csv(path)

  /** Re-export erroneous rows as a single JSON array-of-objects file —
    * the original-format errors file for JSON sources (reference
    * JsonDataProvider.java:218-278 re-writes the flagged items as a JSON
    * array). The errors side channel is a single file by contract, so
    * the driver streams it partition-at-a-time (`toLocalIterator`) —
    * bounded memory, never a full `collect`.
    */
  def exportErrorsJson(errors: DataFrame, path: String): Unit = {
    val names = errors.columns
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(path), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.write("[")
      val it = errors.toLocalIterator()
      var first = true
      while (it.hasNext) {
        val row = it.next()
        if (!first) w.write(",")
        first = false
        w.write("\n\t{")
        w.write(names.zipWithIndex.map { case (n, i) =>
          "\"" + jsonEscape(n) + "\": " + jsonValue(row.get(i))
        }.mkString(", "))
        w.write("}")
      }
      w.write("\n]\n")
    } finally w.close()
  }

  /** Re-export erroneous rows as a single XML file:
    * `<root><entry><col>value</col>…</entry>…</root>`, nulls written as
    * `nullValueText` — the original-format errors file for XML sources
    * (reference XmlDataProvider.java:205-281, value rendering at
    * :244-258: dates as `yyyy-MM-dd HH:mm:ss`, numbers/strings as text).
    */
  def exportErrorsXml(errors: DataFrame, path: String, rootTag: String = "list",
                      entryTag: String = "entry", nullValueText: String = ""): Unit = {
    val names = errors.columns
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(path), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      w.write(s"<$rootTag>")
      val it = errors.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        w.write(s"\n\t<$entryTag>")
        names.zipWithIndex.foreach { case (n, i) =>
          val v = row.get(i)
          val text = if (v == null) nullValueText else textValue(v)
          val tag = xmlTag(n)
          w.write(s"\n\t\t<$tag>${xmlEscape(text)}</$tag>")
        }
        w.write(s"\n\t</$entryTag>")
      }
      w.write(s"\n</$rootTag>\n")
    } finally w.close()
  }

  private val TsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Reference value rendering (XmlDataProvider.java:244-258). */
  private def textValue(v: Any): String = v match {
    case t: java.sql.Timestamp => TsFmt.format(t.toLocalDateTime)
    case d: java.math.BigDecimal => d.toPlainString
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case other => other.toString
  }

  /** Column name → well-formed XML element name: invalid characters
    * become '_' and a leading non-letter gets a '_' prefix — a header
    * like "First Name" must not render the whole errors file unparseable.
    */
  private def xmlTag(n: String): String = {
    val cleaned = n.map(c =>
      if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '_')
    if (cleaned.isEmpty || !(cleaned.head.isLetter || cleaned.head == '_'))
      "_" + cleaned
    else cleaned
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    // bare NaN/Infinity tokens are not JSON — render as null
    case d: Double if d.isNaN || d.isInfinite => "null"
    case f: Float if f.isNaN || f.isInfinite => "null"
    case s: String => "\"" + jsonEscape(s) + "\""
    case b: Boolean => b.toString
    case n: java.math.BigDecimal => n.toPlainString
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) => n.toString
    case other => "\"" + jsonEscape(textValue(other)) + "\""
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }
}
