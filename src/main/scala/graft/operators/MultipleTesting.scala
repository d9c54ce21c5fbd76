package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiple-testing control — the missing piece once a pipeline runs
  * a test PER SEGMENT (per-source drift, per-nation conversion,
  * per-feature leakage): at 25 segments and α = 0.05 one expects a
  * false alarm per run, so raw p-values cannot gate anything. The
  * Benjamini–Hochberg step-up procedure controls the FALSE DISCOVERY
  * RATE — of the hypotheses it rejects, at most a fraction α are
  * expected false — the standard dashboard-grade correction
  * (Benjamini & Hochberg 1995).
  *
  * Scale shape: the input is one row per HYPOTHESIS (a per-segment
  * aggregate, GROUP-like by contract — never per-row data), so the
  * rank window and running min run on an aggregation-sized frame.
  * Float discipline: each p-value is one fixed float tree rounded
  * 6 dp ([[normalTwoSidedP]]); the adjusted p is one multiply/divide
  * per row off the rounded p plus an order-independent running MIN —
  * engine-deterministic throughout.
  */
object MultipleTesting {

  /** Two-sided normal p-value `2(1 − Φ(|z|)) = erfc(|z|/√2)` as one
    * fixed column tree, via the Abramowitz–Stegun 7.1.26 rational
    * approximation (|error| < 1.5e-7, inside the 6-dp contract),
    * rounded 6 dp. The SAME literals must appear in any replaying SQL
    * — the approximation is part of the operator's portable
    * definition.
    */
  def normalTwoSidedP(z: Column): Column = {
    val x = abs(z) * 0.7071067811865476 // |z|/√2
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - 1.453152027) * t + 1.421413741)
      * t - 0.284496736) * t + 0.254829592) * t
    round(poly * exp(-x * x), 6) + 0.0
  }

  /** Benjamini–Hochberg step-up over one row per hypothesis:
    * `(keyCol, pCol)` → `(keyCol, p_value, rank, p_adj, reject)` with
    * `p_adj(i) = min_{j ≥ i} (p_(j)·m/j)` capped at 1 (the standard
    * monotone adjusted p), `reject = p_adj ≤ alpha`. Ranking breaks
    * p ties on the key, so both engines order identically. The frame
    * must be aggregation-sized (one row per tested segment).
    */
  def benjaminiHochberg(df: DataFrame, keyCol: String, pCol: String,
                        alpha: Double = 0.05): DataFrame = {
    val m = Window.partitionBy()
    val byP = Window.orderBy(col("p_value"), col(keyCol))
    // step-up: running min of p·m/rank from the LARGEST rank down
    val fromTop = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(pCol).cast("double").as("p_value"))
      .filter(col("p_value").isNotNull)
      .withColumn("__m", count(lit(1)).over(m))
      .withColumn("rank", row_number().over(byP))
      .withColumn("__raw",
        col("p_value") * col("__m").cast("double") /
          col("rank").cast("double"))
      .withColumn("p_adj",
        round(least(min(col("__raw")).over(fromTop), lit(1.0)), 6) + 0.0)
      .withColumn("reject", col("p_adj") <= lit(alpha))
      .select(col(keyCol), col("p_value"), col("rank").cast("long").as("rank"),
        col("p_adj"), col("reject"))
  }
}
