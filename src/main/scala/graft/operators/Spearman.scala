package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group Spearman rank correlation — the monotone-association
  * screen (does `value` drift with time inside each event type? does
  * doc quality track length?) that is robust to outliers and any
  * monotone transform, unlike Pearson on raw values.
  *
  * ρ = Pearson(rank x, rank y) with midranks for ties. Scale shape:
  * ranks come from the distinct-value count frame per group (bounded
  * by |distinct values|, not |rows|) with the prefix computed by the
  * distributed two-pass [[Ordinals.withOrderedPrefixSum]] over a
  * (group, value) total order — per-group bases are recovered with one
  * hash agg (min prefix per group), so there is NO window anywhere,
  * partitioned or otherwise. Midranks are held as exact 2·rank
  * BIGINTs (halves stay integral); Pearson's moments accumulate in
  * DECIMAL and the single float divide+sqrt runs once per group,
  * rounded 6 dp (ρ is invariant to the ×2 scaling).
  */
object Spearman {

  /** `(group, n, rho)` per group; `rho` NULL when either variable is
    * constant within the group (zero rank variance).
    */
  def correlation(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(xCol).as("x"),
        col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val rx = midranks2(base, "x", "mx2")
    val ry = midranks2(base, "y", "my2")
    val ranked = base
      .join(rx, Seq("g", "x")).join(ry, Seq("g", "y"))
    // moments of the exact 2·midrank integers. mx2/my2 reach 2n, so the
    // per-row products reach 4n² and their group sums 4n³ — BIGINT would
    // silently wrap at n ≈ 1.3e6 rows per group. All products and sums
    // therefore run in DECIMAL: (19,0)×(19,0) caps at Spark's 38-digit
    // DECIMAL (scale 0, no precision loss), exact through the final
    // n·sxy − sx·sy cross-products (≤ 4n⁴) for n ≤ ~1.2e9 rows per
    // group; past that the 38-digit cap turns rho NULL (loud), never
    // silently wrong
    def cd(c: Column) = c.cast("decimal(19,0)")
    val m = ranked.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(cd(col("mx2"))).as("sx"),
      sum(cd(col("my2"))).as("sy"),
      sum(cd(col("mx2")) * cd(col("my2"))).as("sxy"),
      sum(cd(col("mx2")) * cd(col("mx2"))).as("sxx"),
      sum(cd(col("my2")) * cd(col("my2"))).as("syy"))
    m.withColumn("__num",
        cd(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("__vx",
        cd(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("__vy",
        cd(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col("g").as("group"), col("n"),
        when(col("__vx") === 0 || col("__vy") === 0,
            lit(null).cast("double"))
          .otherwise(round(col("__num").cast("double") /
            sqrt(col("__vx").cast("double") * col("__vy").cast("double")), 6))
          .as("rho"))
  }

  /** Per-(group, value) exact 2·midrank: distinct-value counts, global
    * two-pass prefix over the (g, v) order, per-group base subtracted.
    * Returns `(g, <valueName>, <outName>)`.
    */
  private def midranks2(base: DataFrame, valueName: String,
                        outName: String): DataFrame = {
    val perValue = base.groupBy(col("g"), col(valueName))
      .agg(count(lit(1)).as("t"))
    val pref = Ordinals.withOrderedPrefixSum(
      perValue, Seq(col("g"), col(valueName)), "t", "below")
    val groupBase = pref.groupBy("g").agg(min(col("below")).as("gbase"))
    pref.join(groupBase, Seq("g"))
      .select(col("g"), col(valueName),
        (lit(2L) * (col("below") - col("gbase")) + col("t") + 1L)
          .as(outName))
  }
}
