package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mann–Whitney U / Wilcoxon rank-sum test — the nonparametric
  * two-sample comparison (does group A stochastically dominate
  * group B?), the standard A/B companion to the Welch t when values
  * are skewed or ordinal. Uses midranks for ties and the tie-corrected
  * normal approximation (Lehmann, "Nonparametrics", §1.3).
  *
  * Scale shape: ranks come from ONE value-keyed hash aggregation plus
  * a prefix over the per-value counts — because tied observations all
  * take the SAME midrank, ranking needs only the distinct-value count
  * frame (bounded by |distinct values|, not |rows|), and the prefix is
  * the distributed two-pass [[Ordinals.withOrderedPrefixSum]] (no
  * single-partition window — a high-cardinality value column cannot
  * serialize this stage). All rank mass is exact in halves
  * (midrank = (lo + hi)/2 — accumulated as 2·midrank BIGINTs); the
  * normal approximation's float ops run once, on one row, rounded
  * 6 dp.
  */
object MannWhitney {

  /** One row comparing `valueCol` between rows where `isA` and the
    * rest: `(n_a, n_b, u_a_x2, z)` — `u_a_x2` is 2·U_A (exact
    * integer; U itself may end in .5), `z` the tie-corrected normal
    * approximation of (U_A − μ)/σ, rounded 6 dp.
    */
  def uTest(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val perValue = df
      .select(col(valueCol).as("v"), isA.cast("boolean").as("a"))
      .filter(col("v").isNotNull)
      .groupBy("v")
      .agg(count(lit(1)).as("t"), // tie-group size
        sum(when(col("a"), 1L).otherwise(0L)).as("ta"))
    // "below" = exclusive prefix of tie-group sizes — exactly the
    // distributed two-pass prefix sum's contract (v is distinct)
    val ranked = Ordinals.withOrderedPrefixSum(
        perValue, Seq(col("v")), "t", "below")
      // midrank = below + (t+1)/2; keep ×2 to stay integer: 2·below+t+1
      .withColumn("mid2", lit(2L) * col("below") + col("t") + 1L)
    ranked.agg(
        sum(col("ta")).as("n_a"),
        sum(col("t") - col("ta")).as("n_b"),
        sum(col("ta") * col("mid2")).as("r_a_x2"), // 2·(rank sum of A)
        sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
      .withColumn("u_a_x2",
        col("r_a_x2") - col("n_a") * (col("n_a") + 1L))
      .withColumn("__n", col("n_a") + col("n_b"))
      // σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))); all inputs exact
      .withColumn("__mu2", col("n_a") * col("n_b")) // 2·μ = n_a·n_b
      .withColumn("__var",
        col("n_a").cast("double") * col("n_b").cast("double") / 12.0 *
          ((col("__n") + 1L).cast("double") -
            col("tie3").cast("double") /
              (col("__n").cast("double") * (col("__n") - 1L).cast("double"))))
      .withColumn("z", round(
        (col("u_a_x2") - col("__mu2")).cast("double") /
          (lit(2.0) * sqrt(col("__var"))), 6))
      .select(col("n_a"), col("n_b"), col("u_a_x2"), col("z"))
  }
}
