package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source with the reference's dialect semantics
  * (dataprovider/CsvDataProvider.java:28-319, SURVEY §2.1):
  * configurable separator/quote/escape (defaults `;` and `"`), optional
  * headers (else `column_1..N`), null-string token, value trim, and
  * permissive underfilled-line null-fill. Parsing itself is Spark's
  * vectorized CSV reader (codegen'd, splittable, predicate-pushdown
  * capable) — only the naming/token/trim semantics are layered on top.
  */
object CsvSource {

  case class CsvOptions(separator: String = ";", quote: String = "\"",
                        escape: String = "\"", header: Boolean = true,
                        nullToken: Option[String] = None, trimValues: Boolean = false,
                        encoding: String = "UTF-8")

  private def post(df: DataFrame, o: CsvOptions): DataFrame = {
    // no-headers mode: reference names columns column_1..N
    // (CsvDataProvider.java:117-160)
    val named =
      if (o.header) df
      else df.toDF(df.columns.indices.map(i => s"column_${i + 1}"): _*)
    val cleaned = named.columns.foldLeft(named) { (acc, c) =>
      var e = col(c)
      if (o.trimValues) e = trim(e)
      o.nullToken.foreach { t => e = when(e === t, lit(null)).otherwise(e) }
      acc.withColumn(c, e)
    }
    cleaned
  }

  def read(spark: SparkSession, path: String, o: CsvOptions = CsvOptions()): DataFrame =
    post(spark.read
      .option("sep", o.separator).option("quote", o.quote).option("escape", o.escape)
      .option("header", o.header.toString).option("mode", "PERMISSIVE")
      .option("encoding", o.encoding)
      .csv(path), o)

  /** Parse pre-loaded lines (inline data `-data`, or a decompressed
    * stream from [[Compression]]).
    */
  def readLines(lines: Dataset[String], o: CsvOptions = CsvOptions()): DataFrame =
    post(lines.sparkSession.read
      .option("sep", o.separator).option("quote", o.quote).option("escape", o.escape)
      .option("header", o.header.toString).option("mode", "PERMISSIVE")
      .csv(lines), o)

  /** Quote-aware single-line field split with the dialect's separator,
    * quote and quote-escape (escape == quote means doubled-quote
    * escaping). Single-line fields only — mirrors the parse path's
    * `multiLine=false`.
    */
  private[graft] def splitLine(line: String, sep: Char, quote: Char,
                               esc: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == esc && esc != quote && i + 1 < line.length &&
            line.charAt(i + 1) == quote) { cur.append(quote); i += 1 }
        else if (c == quote) {
          if (esc == quote && i + 1 < line.length && line.charAt(i + 1) == quote) {
            cur.append(quote); i += 1
          } else inQ = false
        } else cur.append(c)
      } else {
        if (c == quote && cur.isEmpty) inQ = true
        else if (c == sep) { out += cur.toString; cur.clear() }
        else cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  /** Structure error raised by [[validateStructure]]. */
  final class CsvStructureException(msg: String) extends IllegalStateException(msg)

  /** Reference field-count strictness (CsvDataProvider.java:85-90,
    * DbImportTest_Derby.testCsvImportErrorStructure): a data line whose
    * field count differs from the header's ABORTS the import — unless
    * `allowUnderfilled` (`-a`) permits short lines (the parser
    * null-fills them) or `removeSurplusEmpty` (`-r`) permits surplus
    * TRAILING fields that are all empty (the parser drops them).
    * Surplus non-empty fields are always an error.
    *
    * Runs as its own distributed scan over the raw lines (one pass,
    * first violation wins); the vectorized CSV parse path is unchanged.
    * Blank lines are ignored, matching the parser. With `header=false`
    * the first line still defines the expected field count.
    */
  def validateStructure(lines: Dataset[String], o: CsvOptions,
                        allowUnderfilled: Boolean = false,
                        removeSurplusEmpty: Boolean = false): Unit = {
    val sep = o.separator.headOption.getOrElse(';')
    val quote = o.quote.headOption.getOrElse('"')
    val esc = o.escape.headOption.getOrElse(quote)
    val hasHeader = o.header
    val first = lines.head(1)
    if (first.isEmpty) return
    val n = splitLine(first(0), sep, quote, esc).length
    val bad = lines.rdd.zipWithIndex().flatMap { case (line, idx) =>
      if (idx == 0L || line.isEmpty) None // line 0 defines n either way
      else {
        val got = splitLine(line, sep, quote, esc)
        if (got.length == n) None
        else if (got.length < n) {
          if (allowUnderfilled) None else Some((idx + 1, got.length))
        } else if (removeSurplusEmpty && got.drop(n).forall(_.isEmpty)) None
        else Some((idx + 1, got.length))
      }
    }.take(1)
    bad.headOption.foreach { case (lineNo, got) =>
      throw new CsvStructureException(
        s"CSV structure error in line $lineNo: expected $n fields, got $got" +
          (if (hasHeader) "" else " (field count set by the first line)"))
    }
  }

  /** [[validateStructure]] over a file path. */
  def validateStructure(spark: SparkSession, path: String, o: CsvOptions,
                        allowUnderfilled: Boolean,
                        removeSurplusEmpty: Boolean): Unit =
    validateStructure(spark.read.textFile(path), o,
      allowUnderfilled, removeSurplusEmpty)
}
