package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline CUSUM changepoint location per key: the index where the
  * cumulative deviation from the series mean peaks —
  * `argmax_k |Σ_{i≤k}(x_i − x̄)|`, the classic single-changepoint
  * statistic (Page 1954's cumulative-sum chart, evaluated offline).
  * EXACT: the deviation sum is cross-multiplied by the series length
  * (`n·Σ_{i≤k} x_i − k·S` over integer values), so the argmax compares
  * exact integers and ties break to the earliest row identically on
  * any engine. The final prefix (k = n) is excluded — its cusum is
  * identically zero.
  *
  * Scale shape: one key-partitioned window (running sum + ordinal),
  * one per-key total aggregation joined back (key-partitioned, no
  * broadcast needed — it reuses the window's partitioning), and one
  * arg-max hash aggregation via `min(struct)`. Keys with a single row
  * do not appear (no proper prefix exists).
  */
object Changepoint {

  /** (keyCol, cp_tie, cp_index, cusum_abs, n_rows): per key, the
    * `(tsCol, tieCol)`-earliest row index k maximizing
    * `|n·prefix_k − k·total|` over integer `valueCol`, with that exact
    * scaled statistic. `cp_tie` carries the arg row's `tieCol`.
    */
  def cusumPeak(events: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, valueCol: String): DataFrame = {
    val wRun = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = events
      .withColumn("__k", count(lit(1)).over(wRun))
      .withColumn("__run", sum(col(valueCol)).over(wRun))
    // totals straight off the raw frame — deriving them from `run`
    // would make Spark re-sort the whole window subtree for the agg
    // branch (plans don't share unreferenced subtrees)
    val tot = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__tot"))
    run.join(tot, Seq(keyCol))
      .filter(col("__k") < col("__n"))
      .withColumn("__ac",
        abs(col("__n") * col("__run") - col("__k") * col("__tot")))
      .groupBy(col(keyCol))
      .agg(min(struct((-col("__ac")).as("neg"), col(tsCol), col(tieCol),
        col("__k"), col("__n"))).as("m"))
      .select(col(keyCol), col(s"m.$tieCol").as("cp_tie"),
        col("m.__k").as("cp_index"), (-col("m.neg")).as("cusum_abs"),
        col("m.__n").as("n_rows"))
  }
}
