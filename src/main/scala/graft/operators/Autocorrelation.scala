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

  /** Cross-correlation function between two aligned series — "does x
    * LEAD y?": `ccf(k) = Σ dx_t · dy_{t+k} / √(Σdx² · Σdy²)` for
    * lags −maxLag..maxLag (positive k: x leads y by k periods). The
    * lead-lag companion to [[acf]], and the standard first look
    * before any causal claim between two metrics.
    *
    * Same exactness scheme as [[acf]]: deviations are n-scaled exact
    * DECIMALs (`n·x − Σx`), the numerator and both denominator
    * moments are exact DECIMAL sums, and the one float expression per
    * lag (a divide by the sqrt of two exact-moment doubles) is
    * rounded 6 dp. Same scale shape too: one persisted |series|-sized
    * projection, one window pass materializing all 2·maxLag lag
    * columns, one explode + hash agg. NULL ccf when either series is
    * constant.
    *
    * Output: `(lag, n_pairs, ccf)` for lag ∈ [−maxLag, maxLag].
    */
  def ccf(series: DataFrame, orderCol: String, xCol: String,
          yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.orderBy(col("__o"))
    val ser = Retained.track(series
      .select(col(orderCol).as("__o"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .persist())
    val tot = ser.agg(count(lit(1)).as("__n"),
      sum(col("__x").cast("decimal(19,0)")).as("__sx"),
      sum(col("__y").cast("decimal(19,0)")).as("__sy"))
    val dev = ser
      .crossJoin(broadcast(tot)) // 1-row build side: scalar attach
      .select(col("__o"),
        (col("__x").cast("decimal(19,0)") * col("__n") - col("__sx"))
          .cast("decimal(19,0)").as("__dx"),
        (col("__y").cast("decimal(19,0)") * col("__n") - col("__sy"))
          .cast("decimal(19,0)").as("__dy"))
    val ks = (-maxLag to maxLag).filter(_ != 0)
    // entry k must hold dy(t+k): lag with a NEGATIVE offset is lead,
    // so lag(dy, −k) at row t reads dy(t+k)
    val withLags = dev.select(Seq(col("__dx"), col("__dy")) ++
      ks.map(k => lag(col("__dy"), -k).over(w).as(s"__l${k + maxLag}")): _*)
    val dens = withLags.agg(
      sum(col("__dx") * col("__dx")).as("__denx"),
      sum(col("__dy") * col("__dy")).as("__deny"))
    // lag 0 comes straight off the row; shifted lags via the explode.
    // The global agg yields one (0-count) row even on an EMPTY series
    // where the oracle's join yields none — filter it so the
    // degenerate case agrees (0 rows on both engines)
    val zero = withLags
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__dx") * col("__dy")).as("__num"))
      .withColumn("lag", lit(0L))
      .filter(col("n_pairs") > 0L)
    val shifted = withLags
      .select(col("__dx"), posexplode(
        array(ks.map(k => col(s"__l${k + maxLag}")): _*))
        .as(Seq("__i", "__ld")))
      .filter(col("__ld").isNotNull)
      // array index i enumerates ks in order; recover the signed lag
      .withColumn("lag",
        when(col("__i") < maxLag, col("__i") - maxLag)
          .otherwise(col("__i") - maxLag + 1).cast("long"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__dx") * col("__ld")).as("__num"))
    shifted.unionByName(zero.select(col("lag"), col("n_pairs"),
        col("__num")))
      .crossJoin(broadcast(dens)) // 1-row build side: scalar attach
      .select(col("lag"), col("n_pairs"),
        when(col("__denx") === 0 || col("__deny") === 0,
            lit(null).cast("double"))
          .otherwise(round(col("__num").cast("double") /
            sqrt(col("__denx").cast("double") *
              col("__deny").cast("double")), 6) + 0.0).as("ccf"))
      .orderBy(col("lag"))
  }
}
