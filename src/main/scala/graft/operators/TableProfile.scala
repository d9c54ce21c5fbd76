package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — per-column null counts, exact distinct counts, and
  * min/max, the pre-import inspection step of an import tool (drives
  * VARCHAR sizing, PK candidacy, null-token decisions; see the schema
  * inference the import pipeline applies on CSV sources).
  *
  * One aggregation pass over the table. Multiple exact COUNT(DISTINCT)
  * columns make Catalyst plan an Expand (input replicated once per
  * distinct aggregate) — the honest cost of exactness; at 100 TB the
  * drop-in relaxation is `approx_count_distinct` per column (HLL, one
  * pass, no Expand), same output shape.
  */
object TableProfile {

  /** One row per profiled column: (column_name, n_rows, n_nonnull,
    * ndv, min_s, max_s) with min/max rendered as strings.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column_name"), col("n_rows"),
        col(s"nn_$c").as("n_nonnull"), col(s"ndv_$c").as("ndv"),
        col(s"mn_$c").as("min_s"), col(s"mx_$c").as("max_s"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }
}
