package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt's linear-trend smoothing (double exponential smoothing) —
  * EWMA's trend-aware sibling: per series keep a smoothed LEVEL and a
  * smoothed TREND, `l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1})`,
  * `b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}`, with the one-step forecast
  * `l_t + b_t`. The usual float recursion is order-fragile; here
  * α = 1/5 and β = 1/10 are exact rationals and the recurrence runs
  * in INTEGER cent units with half-toward-+∞ rounding via a
  * floor-division identity, so every (level, trend) pair is exactly
  * reproducible on any engine: `round(a/den) = (2a + den) floordiv
  * (2·den)`, computed on an offset-shifted positive numerator so
  * truncating and flooring divisions agree even when the trend goes
  * negative.
  *
  * Spark shape: a per-KEY sequential fold (`groupByKey.flatMapGroups`
  * with an in-group sort) — the recurrence is inherently sequential
  * WITHIN a series, so the unit of parallelism is the series key, and
  * each group is calendar-bounded (a daily series is |days| rows no
  * matter how many raw rows aggregated into it). Callers pass the
  * PRE-AGGREGATED series.
  */
object Holt {

  private val Off = 100000000000000L // 1e14 ≫ any cent-scale numerator

  /** round-half-toward-+∞ of a/den for |a| ≪ Off·den, exact. */
  private def rdiv(a: Long, den: Long): Long =
    (2 * a + den + 2 * den * Off) / (2 * den) - Off

  /** `(keyCol, orderCol, centsCol, level, trend, forecast_next)` per
    * input row: the Holt state after consuming that row, seeded
    * `l_1 = x_1, b_1 = 0`. Rows order by `orderCol` within each key.
    */
  def linearTrend(series: DataFrame, keyCol: String, orderCol: String,
                  centsCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val keyType = series.schema(keyCol).dataType
    val rows = series.select(col(keyCol).cast("string").as("k"),
        col(orderCol).cast("long").as("t"),
        col(centsCol).cast("long").as("x"))
      .as[(String, Long, Long)]
    rows.groupByKey(_._1).flatMapGroups { (k, it) =>
      val sorted = it.toArray.sortBy(_._2) // group = one bounded series
      var l = 0L
      var b = 0L
      sorted.iterator.zipWithIndex.map { case ((_, t, x), i) =>
        if (i == 0) { l = x; b = 0L }
        else {
          val s = l + b
          val lNew = rdiv(x + 4 * s, 5) // α = 1/5
          val bNew = rdiv((lNew - l) + 9 * b, 10) // β = 1/10
          l = lNew
          b = bNew
        }
        (k, t, x, l, b, l + b)
      }
    }.toDF(keyCol, orderCol, centsCol, "level", "trend", "forecast_next")
      // the fold keys on a string rendering; give the caller back
      // their key TYPE (string round-trips exactly for the integral /
      // string keys a series key is) so ordering and joins stay native
      .withColumn(keyCol, col(keyCol).cast(keyType))
      .orderBy(col(keyCol), col(orderCol))
  }

  /** Holt–Winters ADDITIVE triple smoothing (level + trend +
    * seasonal, period `m`): the full classical forecasting recurrence
    * on top of [[linearTrend]], for series with a repeating shape —
    * α = 1/4, β = 1/10, γ = 1/5, all exact rationals, every update a
    * [[rdiv]] half-toward-+∞ integer rounding, so the whole triple
    * state replays bit-identically in a recursive-CTE oracle.
    *
    * Init on the first `m` points: `l = rdiv(Σx, m)`, `b = 0`,
    * `s_i = x_i − l`; one output row per point AFTER the init window
    * (series with ≤ m points emit nothing). `forecast_next =
    * l + b + s_{next phase}`. Same per-key sequential-fold shape and
    * calendar-bounded-series contract as [[linearTrend]].
    *
    * Output: `(keyCol, orderCol, centsCol, level, trend, seasonal,
    * forecast_next)`.
    */
  def seasonalTrend(series: DataFrame, keyCol: String, orderCol: String,
                    centsCol: String, period: Int): DataFrame = {
    require(period >= 2, s"period must be at least 2, got $period")
    val spark = series.sparkSession
    import spark.implicits._
    val keyType = series.schema(keyCol).dataType
    val rows = series.select(col(keyCol).cast("string").as("k"),
        col(orderCol).cast("long").as("t"),
        col(centsCol).cast("long").as("x"))
      .as[(String, Long, Long)]
    rows.groupByKey(_._1).flatMapGroups { (k, it) =>
      val sorted = it.toArray.sortBy(_._2)
      if (sorted.length <= period) Iterator.empty
      else {
        val l0 = rdiv(sorted.take(period).map(_._3).sum, period.toLong)
        var l = l0
        var b = 0L
        val sv = scala.collection.mutable.Queue(
          sorted.take(period).map(_._3 - l0): _*)
        sorted.iterator.drop(period).map { case (_, t, x) =>
          val sOld = sv.dequeue()
          val lNew = rdiv((x - sOld) + 3 * (l + b), 4) // α = 1/4
          val bNew = rdiv((lNew - l) + 9 * b, 10) // β = 1/10
          val sNew = rdiv((x - lNew) + 4 * sOld, 5) // γ = 1/5
          l = lNew
          b = bNew
          sv.enqueue(sNew)
          (k, t, x, l, b, sNew, l + b + sv.head)
        }
      }
    }.toDF(keyCol, orderCol, centsCol, "level", "trend", "seasonal",
        "forecast_next")
      .withColumn(keyCol, col(keyCol).cast(keyType))
      .orderBy(col(keyCol), col(orderCol))
  }
}
