package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment-readout metrics beyond the plain mean difference (q130
  * Welch): the delta-method CI for RATIO metrics and the
  * sample-ratio-mismatch guardrail — the two checks that make an A/B
  * dashboard trustworthy before anyone reads its effect sizes.
  *
  * Both follow the exact-moment discipline: one hash aggregation
  * accumulating DECIMAL sums, every published double one fixed float
  * tree rounded 6 dp.
  */
object ExperimentMetrics {

  /** Delta-method CI for the ratio metric `R = Σx/Σy` over per-unit
    * rows (x = numerator mass, y = denominator mass per user/session —
    * the "revenue per click" shape whose naive per-row variance is
    * wrong because units, not rows, are independent). Variance by the
    * standard expansion
    * `Var(R) ≈ (σx² − 2R·σxy + R²·σy²) / (n·ȳ²)`, CI at the supplied
    * z. One output row:
    * `(n, r, se, ci_lo, ci_hi)`; NULL when Σy = 0 or n < 2.
    * Inputs are integer measures (cents/counts); all five moments are
    * exact DECIMAL.
    */
  def ratioDeltaCi(df: DataFrame, xCol: String, yCol: String,
                   z: Double = 1.959964): DataFrame = {
    val m = df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(19,0)")).as("__sx"),
        sum(col("__y").cast("decimal(19,0)")).as("__sy"),
        sum((col("__x").cast("decimal(18,0)") *
          col("__x").cast("decimal(18,0)"))).as("__sxx"),
        sum((col("__y").cast("decimal(18,0)") *
          col("__y").cast("decimal(18,0)"))).as("__syy"),
        sum((col("__x").cast("decimal(18,0)") *
          col("__y").cast("decimal(18,0)"))).as("__sxy"))
    val nD = col("n").cast("double")
    val r = col("__sx").cast("double") / col("__sy").cast("double")
    val varx = (col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double") / nD) /
      (nD - 1.0)
    val vary = (col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double") / nD) /
      (nD - 1.0)
    val covxy = (col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double") / nD) /
      (nD - 1.0)
    val ybar = col("__sy").cast("double") / nD
    val se = sqrt((varx - lit(2.0) * r * covxy + r * r * vary) /
      (nD * ybar * ybar))
    m.select(col("n"),
        when(col("n") >= 2L && col("__sy") =!= 0L,
          round(r, 6) + 0.0).as("r"),
        when(col("n") >= 2L && col("__sy") =!= 0L,
          round(se, 6) + 0.0).as("se"),
        when(col("n") >= 2L && col("__sy") =!= 0L,
          round(r - lit(z) * se, 6) + 0.0).as("ci_lo"),
        when(col("n") >= 2L && col("__sy") =!= 0L,
          round(r + lit(z) * se, 6) + 0.0).as("ci_hi"))
  }

  /** Sample-ratio-mismatch check: a 1-dof chi-square goodness-of-fit
    * of the two arm sizes against the intended 50/50 —
    * `χ² = (n_a − n_b)²/(n_a + n_b)`, flagged past the 0.05 critical
    * value 3.841459. The cheapest, highest-yield experiment guardrail:
    * an SRM means assignment or logging is broken and every downstream
    * metric is untrustworthy. One row:
    * `(n_a, n_b, chi2, srm_flag)`.
    */
  def srmCheck(df: DataFrame, armCol: String): DataFrame =
    df.select(col(armCol).cast("boolean").as("__a"))
      .filter(col("__a").isNotNull)
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (round((col("n_a") - col("n_b")).cast("double") *
          (col("n_a") - col("n_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"), 6) + 0.0).as("chi2"))
      .withColumn("srm_flag", col("chi2") > 3.841459)
}
