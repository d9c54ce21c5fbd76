package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the Deequ-style
  * pre-flight gate a pipeline runs before promoting a snapshot:
  * every check reduces a table to ONE row `(n_checked, n_violations)`
  * and the audit unions them into a single report frame. A 100 TB
  * run evaluates all per-row checks in one scan each (the checks are
  * plain aggregations — map-side partial, no shuffle beyond the agg)
  * and referential checks as key-only anti joins.
  */
object Constraints {

  /** One audit row. `check` must be a 1-row frame with columns
    * `n_checked` (long) and `n_violations` (long).
    */
  case class Check(name: String, table: String, check: DataFrame)

  /** Rows violating NOT NULL on `c`. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_violations"))

  /** Excess rows beyond the first per duplicate key (0 = unique). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_checked"),
        sum(col("__n") - 1L).as("n_violations"))

  /** Rows where `c` (non-null) falls outside [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Column, hi: Column): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L)).as("n_violations"))

  /** Rows where `c` (non-null) is not in the allowed set. */
  def inSet(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
      sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
        .otherwise(0L)).as("n_violations"))

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (orphans). Key-only projection on both sides — the scan reads
    * two columns, the join carries one.
    */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
    child.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_violations"))))
  }

  /** Union the checks into one report
    * `(constraint_name, table_name, n_checked, n_violations, passed)`,
    * ordered by constraint name.
    */
  def audit(checks: Seq[Check]): DataFrame =
    checks.map { c =>
      c.check.select(lit(c.name).as("constraint_name"),
        lit(c.table).as("table_name"),
        col("n_checked").cast("long").as("n_checked"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0L).as("passed"))
    }.reduce(_ unionAll _).orderBy(col("constraint_name"))
}
