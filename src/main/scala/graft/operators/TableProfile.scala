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

  /** The 100 TB face of [[profile]]: same one-row-per-column shape, but
    * distinct counts come from the KMV sketch
    * ([[graft.plans.KmvLowsAgg]] — `kmv_lows`) instead of exact
    * `count_distinct`, so there is NO Expand: profiling C columns is
    * ONE scan and one global aggregation whose per-column state is a
    * counter plus ≤ k longs (`C × k × 8` bytes of exchange, total).
    * Unlike `approx_count_distinct`'s HLL blob it is engine-replayable:
    * the sketch is the k smallest md5-derived hashes of the CANONICAL
    * string rendering the caller supplies per column (integers as
    * digits, doubles through fixed-scale DECIMAL, timestamps as
    * epoch-micros digits — q236's convention), so a SQL oracle
    * reproduces every value bit-for-bit.
    *
    * Returns `(column_name, n, n_null, kmv_n_kept, kmv_kth_hash,
    * est_distinct)` ordered by column_name; `est_distinct` follows the
    * [[Sketches.kmvEstimate]] discipline (exact below k).
    */
  def profileSketch(df: DataFrame, cols: Seq[(String, Column)],
                    k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profileSketch needs at least one column")
    // Spark resolves column names case-insensitively by default, so
    // two profiled names differing only in case would make the
    // generated __nulls__/__lows__ aliases silently collide
    val clash = cols.map(_._1.toLowerCase).diff(
      cols.map(_._1.toLowerCase).distinct)
    require(clash.isEmpty,
      s"profileSketch column names collide case-insensitively: ${clash.distinct.mkString(", ")}")
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap { case (name, canon) =>
          Seq(
            sum(when(canon.isNull, 1L).otherwise(0L)).as(s"__nulls__$name"),
            graft.plans.KmvLowsAgg.kmvLows(
              Sketches.hash48(canon), k).as(s"__lows__$name"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = one.select(explode(array(cols.map { case (name, _) =>
      struct(
        lit(name).as("column_name"),
        col("__n").as("n"),
        col(s"__nulls__$name").as("n_null"),
        size(col(s"__lows__$name")).cast("long").as("kmv_n_kept"),
        // guard the all-NULL column: element_at(-1) on an empty array
        // is an ANSI error, not a NULL
        when(size(col(s"__lows__$name")) === 0, lit(null).cast("long"))
          .otherwise(element_at(col(s"__lows__$name"), -1))
          .as("kmv_kth_hash"),
        when(size(col(s"__lows__$name")) < k,
          size(col(s"__lows__$name")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Sketches.HashLine) /
            element_at(col(s"__lows__$name"), -1).cast("double"))
          .as("est_distinct"))
    }: _*)).as("__p"))
    rows.select(col("__p.*")).orderBy(col("column_name"))
  }
}
