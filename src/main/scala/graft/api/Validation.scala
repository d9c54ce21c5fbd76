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
}
