package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped ordinary least squares — thousands of tiny regressions in
  * one pass (per-user engagement trend, per-sensor drift, per-SKU
  * price elasticity): `y = a + b·x` fit independently for every key.
  *
  * Scale shape: ONE key-partitioned hash aggregation accumulating the
  * five classic moments (n, Σx, Σy, Σxy, Σx²) — map-side combining,
  * no per-group value buffering, no window, no iteration. The moments
  * are EXACT: x must be a modest integer (caller pre-scales, e.g.
  * seconds offsets), y is cast to DECIMAL(9,2), and every
  * product/sum stays inside DECIMAL(38) headroom (casts below are
  * sized so no operation triggers Spark's precision-loss rescaling).
  * The closed-form slope/intercept ratios are evaluated in doubles
  * once per group and rounded to 6 dp.
  */
object Regression {

  /** `(key, n, slope, intercept)` per group, from
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` and
    * `intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)`.
    * Groups with fewer than 2 points or zero x-variance drop (no
    * line is identified). Headroom contract (checked by the cast
    * sizes below, overflow → null, never silent): |x| ≤ ~1e8 with
    * group sizes to ~1e3 (so Σx² ≤ 1e19), y ≤ ~1e8 at 2 dp — far
    * above the pre-scaled second-offsets this is meant for.
    */
  def olsPerKey(df: DataFrame, keyCol: String, xCol: String,
                yCol: String): DataFrame = {
    val m = df.select(col(keyCol).as("k"),
        col(xCol).cast("long").as("x"),
        col(yCol).cast("decimal(9,2)").as("y"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(12,0)")).as("sx"),   // → (22,0)
        sum(col("y")).as("sy"),                         // → (19,2)
        sum(col("y") * col("x").cast("decimal(12,0)")).as("sxy"), // → (32,2)
        sum((col("x") * col("x")).cast("decimal(20,0)")).as("sxx")) // → (30,0)
    m.filter(col("n") >= 2)
      // every product's operand precisions sum ≤ 37, so no Spark
      // precision-loss rescaling fires; the down-casts bound the
      // legal input range documented above (overflow → null → NO
      // silent wrong answer, the row drops visibly)
      .withColumn("__den",
        (col("n").cast("decimal(4,0)") * col("sxx").cast("decimal(19,0)") -
          col("sx").cast("decimal(16,0)") *
            col("sx").cast("decimal(16,0)")).cast("double"))
      .filter(col("__den") =!= 0.0) // vertical stack of points: no fit
      // + 0.0 canonicalizes IEEE −0.0 (a −ε slope rounds to −0.0 on
      // one engine and +0.0 on the other; they compare equal but
      // print differently)
      .withColumn("slope", round(
        (col("n").cast("decimal(4,0)") * col("sxy").cast("decimal(31,2)") -
          col("sx").cast("decimal(16,0)") * col("sy").cast("decimal(19,2)"))
          .cast("double") / col("__den"), 6) + lit(0.0))
      .withColumn("intercept", round(
        (col("sy").cast("decimal(10,2)") * col("sxx").cast("decimal(19,0)") -
          col("sx").cast("decimal(16,0)") * col("sxy").cast("decimal(19,2)"))
          .cast("double") / col("__den"), 6) + lit(0.0))
      // overflow in the bounding down-casts yields NULL slope/intercept
      // (not an error, under non-ANSI decimal); drop those rows so the
      // "row drops visibly" contract above holds literally — emitting a
      // (k, n, null, null) row would read as a fit
      .filter(col("slope").isNotNull && col("intercept").isNotNull)
      .select(col("k").as(keyCol), col("n"), col("slope"), col("intercept"))
  }
}
