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
}
