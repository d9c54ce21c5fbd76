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

  /** SEQUENTIAL one-sided (upper) CUSUM drift alarm per key — the
    * ONLINE companion to [[cusumPeak]] (which locates a single shift
    * offline) and to `TrendTests.mannKendall` (which scores a monotone
    * trend): Page's control chart `S_i = max(0, S_{i−1} + x_i − slack)`
    * with decision interval `threshold`, answering the monitoring
    * question "WHEN does the alarm fire". Downward drift = run on
    * negated values.
    *
    * The recursion is not window-expressible directly, but the classic
    * identity `S_i = A_i − min(0, min_{j≤i} A_j)` with
    * `A_i = prefix_i − i·slack` turns it into ONE key-partitioned
    * window pass (running sum, ordinal, running min) — no iteration,
    * no driver state, exact integer arithmetic throughout (values and
    * slack in the same integer unit; headroom `n·max|x − slack|`
    * under 2^63).
    *
    * Output one row per key:
    * `(keyCol, n_rows, max_s, alarm_ts, alarm_index)` — the exact
    * maximum of the statistic and the FIRST `tsCol`/index where
    * `S_i ≥ threshold` (NULLs when no crossing). `tsCol` must be
    * unique within a key (a period key, the [[cusumPeak]] contract).
    */
  def cusumAlarm(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, slack: Long,
                 threshold: Long): DataFrame = {
    require(threshold > 0L, s"threshold must be positive, got $threshold")
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = events
      .withColumn("__i", count(lit(1)).over(wRun))
      .withColumn("__adj", sum(col(valueCol)).over(wRun) - col("__i") * slack)
      .withColumn("__s",
        col("__adj") - least(lit(0L), min(col("__adj")).over(wRun)))
    s.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"),
        max(col("__s")).as("max_s"),
        min(when(col("__s") >= threshold,
          struct(col("__i"), col(tsCol)))).as("__a"))
      .select(col(keyCol), col("n_rows"), col("max_s"),
        col(s"__a.$tsCol").as("alarm_ts"),
        col("__a.__i").as("alarm_index"))
  }
}
