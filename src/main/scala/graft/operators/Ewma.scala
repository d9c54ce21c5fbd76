package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact dyadic EWMA smoothing — exponentially-weighted moving average
  * with α = 1/2 over a bounded trailing window, the metric-smoothing /
  * trend-vs-noise primitive for event streams. α = 1/2 makes every
  * weight a power of two, so over a `window`-row tail the weighted sum
  * is EXACT integer arithmetic on value cents: weight(lag i) = 2^(w−1−i),
  * truncated weights renormalize by the actual Σ present. No float
  * accumulates anywhere; the single divide runs per row at the end,
  * rounded 6 dp — bit-portable across engines, unlike the usual
  * recursive float EWMA whose result depends on evaluation order.
  *
  * Scale shape: one key-partitioned sort (the window shuffle) and
  * `window` unrolled `lag()` reads inside ONE window frame — Spark
  * evaluates all lags in a single pass over each partition; cost is
  * O(rows · window) with no self-join and no state beyond the frame.
  */
object Ewma {

  /** Adds `ewma` (6-dp double) per row: the α=1/2 EWMA of `centsCol`
    * (an exact integer column, e.g. value×100) over the trailing
    * `window` rows within `keyCol`, ordered by `orderCol`.
    * `ewma` is in the same scaled units as `centsCol`.
    */
  def dyadicEwma(df: DataFrame, keyCol: String, orderCol: String,
                 centsCol: String, window: Int = 8): DataFrame = {
    require(window >= 1 && window <= 30,
      s"window must be in [1,30] (dyadic weights fit a long), got $window")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    def weight(i: Int): Long = 1L << (window - 1 - i)
    // the lag-0 (current-row) term deliberately does NOT coalesce: a
    // NULL current value propagates to a NULL ewma (no smoothed value
    // for a missing observation), matching the SQL oracle's bare
    // `cents * w` i=0 term; only ABSENT history (lags) coalesces to 0
    val num: Column = (0 until window).map { i =>
      if (i == 0) col(centsCol) * lit(weight(i))
      else coalesce(lag(col(centsCol), i).over(w) * lit(weight(i)), lit(0L))
    }.reduce(_ + _)
    val den: Column = (0 until window).map { i =>
      if (i == 0) lit(weight(i)) // mirrors the oracle; num is already
        // NULL when the current value is, so the bare weight is safe
      else when(lag(col(centsCol), i).over(w).isNotNull, lit(weight(i)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("ewma", round(num.cast("double") / den.cast("double"), 6))
  }
}
