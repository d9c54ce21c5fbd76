package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window 3-sigma anomaly flags over per-key value streams —
  * the standard streaming outlier gate, evaluated batch-side with
  * EXACT arithmetic: values are integer (e.g. cents), rolling
  * mean/variance live as integer sums over the trailing window, and
  * the k-sigma test is the cross-multiplied comparison
  * `(n·v − s)² > k²·(n·q − s²)` — algebraically `((v − mean)/σ)² > k²`
  * with population variance, but zero floats, so any engine flags the
  * identical rows (a float σ would put boundary rows at the mercy of
  * FP rounding). A zero-variance window flags ANY deviation: the
  * right-hand side collapses to 0 and `(n·v − s)² > 0` iff v ≠ mean.
  *
  * Scale shape: ONE key-partitioned window; count/sum/sum-of-squares
  * share the frame, so the sort is paid once. No global state.
  */
object RollingAnomaly {

  /** Rows of `events` whose integer `valueCol` sits more than `sigmas`
    * standard deviations from the mean of the key's previous `window`
    * rows (in `(tsCol, tieCol)` order), keeping only rows with at
    * least `minWindow` predecessors; output adds `window_n`. Integer
    * inputs must be small enough that `n·q` fits a long: |value| below
    * ~10^8 at the default window of 8.
    */
  def anomalies(events: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, valueCol: String, window: Int = 8,
                minWindow: Int = 4, sigmas: Int = 3): DataFrame = {
    require(window >= minWindow && minWindow >= 2,
      s"need window >= minWindow >= 2, got ($window, $minWindow)")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol)).rowsBetween(-window, -1)
    // fail fast (codegen'd scan-stage check) instead of silently
    // overflowing the squared deviation: |v| ≤ 1.5e8 keeps
    // (n·v − s)² ≤ (2·w·1.5e8)² inside a long at the default window
    val guard = abs(col(valueCol)) <= 150000000L
    val v = when(assert_true(guard,
      lit(s"RollingAnomaly: |$valueCol| must be <= 1.5e8")).isNull,
      col(valueCol))
    events
      .withColumn("window_n", count(lit(1)).over(w))
      .withColumn("__s", sum(col(valueCol)).over(w))
      .withColumn("__q", sum(col(valueCol) * col(valueCol)).over(w))
      .filter(col("window_n") >= minWindow &&
        (col("window_n") * v - col("__s")) * (col("window_n") * v - col("__s")) >
          lit(sigmas.toLong * sigmas) *
            (col("window_n") * col("__q") - col("__s") * col("__s")))
      .drop("__s", "__q")
  }
}
