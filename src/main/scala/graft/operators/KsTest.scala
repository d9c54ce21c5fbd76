package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov statistic — the distribution-drift
  * companion to PSI (which needs binning) and Mann–Whitney (which
  * tests location): `D = sup_v |F̂_A(v) − F̂_B(v)|`, sensitive to ANY
  * distributional difference. The key exactness trick: at every
  * observed value, `|c_A/n_A − c_B/n_B| = |c_A·n_B − c_B·n_A| /
  * (n_A·n_B)` — the NUMERATOR is an exact BIGINT, so the supremum and
  * its argmax are integer comparisons with no float anywhere until
  * the final published ratio.
  *
  * Scale shape: one value-keyed hash aggregation (map-side combining)
  * collapses rows to the distinct-value frame, then the cumulative
  * counts come from the distributed two-pass prefix sum
  * ([[Ordinals.withOrderedPrefixSum]] — range-partitioned sort +
  * per-partition offsets, NO single-partition window, so a
  * high-cardinality value column cannot serialize this stage), and
  * the argmax is a tiny top-1 sort.
  */
object KsTest {

  /** One row: `(n_a, n_b, d_num, ks_d, at_value)` — `d_num` the exact
    * integer `max |c_A·n_B − c_B·n_A|`, `ks_d = d_num/(n_A·n_B)`
    * rounded 6 dp, `at_value` the smallest value attaining the
    * supremum (deterministic tie-break).
    */
  def ksTwoSample(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val perValue = df
      .select(col(valueCol).as("v"), isA.cast("boolean").as("a"))
      .filter(col("v").isNotNull)
      .groupBy("v")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("a"), 0L).otherwise(1L)).as("cb"))
    // exclusive prefix per side (distributed; v is distinct so the sort
    // order is total) -> inclusive cumulative = prefix + own count
    val cum = Ordinals.withOrderedPrefixSum(
        Ordinals.withOrderedPrefixSum(perValue, Seq(col("v")), "ca", "__pa"),
        Seq(col("v")), "cb", "__pb")
      .withColumn("cuma", col("__pa") + col("ca"))
      .withColumn("cumb", col("__pb") + col("cb"))
    val tot = cum.agg(max(col("cuma")).as("n_a"), max(col("cumb")).as("n_b"))
    cum.crossJoin(broadcast(tot)) // 1-row totals anchor
      .withColumn("dnum", abs(col("cuma") * col("n_b") -
        col("cumb") * col("n_a")))
      .orderBy(col("dnum").desc, col("v").asc)
      .limit(1)
      .select(col("n_a"), col("n_b"), col("dnum").as("d_num"),
        round(col("dnum").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks_d"),
        col("v").as("at_value"))
  }
}
