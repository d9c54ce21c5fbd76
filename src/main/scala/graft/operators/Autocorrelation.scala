package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample autocorrelation function over an evenly-indexed series —
  * the seasonality/memory screen for metric time series (the lag-7
  * spike IS weekly seasonality; a slow decay IS trend). Uses the
  * standard full-series-mean estimator
  * `r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ_t(x_t−x̄)²`.
  *
  * Exact across engines by n-scaling: with integer-valued `x` the
  * deviation `n·x_t − S` is an exact integer (no mean divide), so both
  * numerator and denominator are DECIMAL(38,0)-exact sums of integer
  * products — the n² factor cancels in the ratio, and the only IEEE
  * operation is the final divide of two exact integers (rounded 6 dp).
  * Inputs must already be integer-valued (cents, counts, micro-units).
  *
  * Spark shape: callers pass a PRE-AGGREGATED series (one row per
  * tick), so the single-partition ordering window runs on a
  * |series|-sized frame — bounded by the calendar, not the data. All
  * `maxLag` lags come out of ONE window pass (an array of lag columns,
  * unpivoted), then one hash aggregation; the raw corpus is never
  * touched here.
  *
  * A constant series has zero denominator; the ratio is explicitly
  * NULL then (guarded — ANSI mode would otherwise raise
  * DIVIDE_BY_ZERO), and the q257 oracle carries the matching
  * `nullif(den, 0)` so both engines agree on the degenerate case.
  */
object Autocorrelation {

  /** `(lag, n_pairs, acf)` for lags 1..maxLag, ordered by lag. */
  def acf(series: DataFrame, orderCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.orderBy(col("__o"))
    // three consumers (totals, denominator, lag numerators) — persist
    // the |series|-sized projection so the caller's source (often a
    // full corpus aggregation) is scanned exactly once
    val ser = Retained.track(series
      .select(col(orderCol).as("__o"), col(valueCol).as("__x"))
      .persist())
    val tot = ser
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast("decimal(19,0)")).as("__s"))
    val dev = ser
      .crossJoin(broadcast(tot)) // 1-row build side: scalar attach
      .select(col("__o"),
        (col("__x").cast("decimal(19,0)") * col("__n") - col("__s"))
          .cast("decimal(19,0)").as("__d"))
    val withLags = dev.select(col("__d") +:
      (1 to maxLag).map(k => lag(col("__d"), k).over(w).as(s"__l$k")): _*)
    val den = withLags
      .agg(sum(col("__d") * col("__d")).as("__den"))
    val nums = withLags
      .select(col("__d"), posexplode(
        array((1 to maxLag).map(k => col(s"__l$k")): _*))
        .as(Seq("__k", "__ld")))
      .filter(col("__ld").isNotNull)
      .groupBy((col("__k") + 1).cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__d") * col("__ld")).as("__num"))
    nums.crossJoin(broadcast(den)) // 1-row build side: scalar attach
      .select(col("lag"), col("n_pairs"),
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise(round(col("__num").cast("double") /
            col("__den").cast("double"), 6) + 0.0).as("acf"))
      .orderBy(col("lag"))
  }
}
