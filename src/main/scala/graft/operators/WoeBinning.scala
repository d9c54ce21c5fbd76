package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equal-frequency discretization + Weight-of-Evidence encoding — the
  * classic credit-scoring / feature-engineering transform (Siddiqi,
  * "Credit Risk Scorecards"): bin a continuous feature into B
  * rank-deciles and score each bin by how strongly it separates a
  * binary target, `WoE = ln((good_b/G)/(bad_b/B))`, plus the bin's
  * information-value contribution.
  *
  * Scale shape: the rank is [[Ordinals.withOrderedOrdinal]] — a
  * range-partitioned distributed sort with per-partition offsets (no
  * single-partition window), the same primitive the exact-quantile
  * operator uses. Bin membership is then pure integer arithmetic on
  * the rank (`(rn−1)·B DIV n`) — no interpolated edge values to
  * reproduce across engines — and the per-bin rollup is one hash
  * aggregation. Counts are exact BIGINTs; the two logs are confined
  * to one final projection and rounded to 6 dp.
  */
object WoeBinning {

  /** `(bin, n_rows, n_bad, n_good, lo, hi, woe, iv)` for `nBins`
    * equal-frequency bins of `valueCol` under the total order
    * `order` (must start with `valueCol` and be a genuine total order
    * for determinism). `badCol` must be a boolean column; +0.5
    * smoothing keeps empty-side bins finite. `iv` is the bin's
    * information-value term `(good_b/G − bad_b/B)·WoE`.
    */
  def woeBins(df: DataFrame, valueCol: String, badCol: Column,
              order: Seq[Column], nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val ranked = Ordinals.withOrderedOrdinal(
        df.withColumn("__bad", badCol.cast("boolean")), order, name = "__rn")
      .select(col(valueCol).as("__v"), col("__bad"), col("__rn"))
    val withN = ranked.crossJoin(
      broadcast(ranked.agg(count(lit(1)).as("__n"))))
    withN
      .withColumn("bin", expr(s"(__rn - 1) * $nBins DIV __n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__bad"), 1L).otherwise(0L)).as("n_bad"),
        min(col("__v")).as("lo"), max(col("__v")).as("hi"))
      .withColumn("n_good", col("n_rows") - col("n_bad"))
      .crossJoin(broadcast(withN.agg(
        sum(when(col("__bad"), 1L).otherwise(0L)).as("__tb"),
        sum(when(col("__bad"), 0L).otherwise(1L)).as("__tg"))))
      .withColumn("__pg", (col("n_good").cast("double") + 0.5) /
        col("__tg").cast("double"))
      .withColumn("__pb", (col("n_bad").cast("double") + 0.5) /
        col("__tb").cast("double"))
      .withColumn("woe", round(log(col("__pg") / col("__pb")), 6))
      .withColumn("iv", round((col("__pg") - col("__pb")) * col("woe"), 6))
      .select(col("bin"), col("n_rows"), col("n_bad"), col("n_good"),
        col("lo"), col("hi"), col("woe"), col("iv"))
  }
}
