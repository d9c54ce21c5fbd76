package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group higher distribution moments — skewness and excess
  * kurtosis — from exact integer power sums: the distribution-shape
  * audit that catches what mean/variance monitoring can't (a metric
  * whose mean is stable while its tail fattens is drifting).
  *
  * Scale shape: ONE hash aggregation per group accumulating
  * S1..S4 = Σc, Σc², Σc³, Σc⁴ over an integer (cents-scaled) column.
  * Power sums are mergeable (map-side partial combine works), unlike
  * streaming central-moment recurrences. Every Sk is held in DECIMAL
  * sized so the per-row powers stay inside BOTH engines' 38-digit
  * multiply cap (c ≤ 10⁶ cents: c⁴ ≤ 10²⁴ at DECIMAL(24,0)).
  *
  * The closed forms then run in DOUBLE from the exact sums — the same
  * IEEE expression tree on both engines, rounded 6 dp:
  * m2 = S2/n − μ², m3 = S3/n − 3μS2/n + 2μ³,
  * m4 = S4/n − 4μS3/n + 6μ²S2/n − 3μ⁴;
  * skew = m3/m2^1.5, excess kurtosis = m4/m2² − 3.
  */
object Moments {

  /** `(group, n, mean, m2, skewness, kurtosis_excess)` per group over
    * `centsCol` (an integer column, |c| < 10⁶; REJECTED at runtime
    * beyond that — silent overflow would corrupt S4). Results are in
    * cents units; skew/kurtosis are scale-free. NULL shape stats when
    * the group is constant (m2 = 0).
    */
  def shape(df: DataFrame, groupCol: String, centsCol: String): DataFrame = {
    val guarded = when(
      assert_true(abs(col(centsCol)) < 1000000L,
        lit(s"Moments.shape: |$centsCol| must be < 1e6")).isNull,
      col(centsCol).cast("decimal(6,0)"))
    val c1 = guarded
    val c2 = c1 * c1 // (12,0)
    val c4 = c2 * c2 // (24,0)
    val sums = df.groupBy(col(groupCol).as("group")).agg(
      count(lit(1)).as("n"),
      sum(c1).cast("decimal(16,0)").as("s1"),
      sum(c2).cast("decimal(22,0)").as("s2"),
      sum(c2 * c1).cast("decimal(28,0)").as("s3"),
      sum(c4).cast("decimal(34,0)").as("s4"))
    val nD = col("n").cast("double")
    val mu = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - mu * mu
    val m3 = col("s3").cast("double") / nD -
      lit(3.0) * mu * (col("s2").cast("double") / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4").cast("double") / nD -
      lit(4.0) * mu * (col("s3").cast("double") / nD) +
      lit(6.0) * mu * mu * (col("s2").cast("double") / nD) -
      lit(3.0) * mu * mu * mu * mu
    sums
      .withColumn("mean", round(mu, 6))
      .withColumn("m2", round(m2, 6))
      // m2·sqrt(m2), NOT pow(m2, 1.5): sqrt is IEEE correctly-rounded
      // everywhere, pow is libm-dependent (JVM vs C disagree by ulps);
      // + 0.0 folds a −0.0 rounding into +0.0 on both engines
      .withColumn("skewness",
        when(m2 <= 0.0, lit(null).cast("double"))
          .otherwise(round(m3 / (m2 * sqrt(m2)), 6) + lit(0.0)))
      .withColumn("kurtosis_excess",
        when(m2 <= 0.0, lit(null).cast("double"))
          .otherwise(round(m4 / (m2 * m2) - lit(3.0), 6) + lit(0.0)))
      .select(col("group"), col("n"), col("mean"), col("m2"),
        col("skewness"), col("kurtosis_excess"))
  }
}
