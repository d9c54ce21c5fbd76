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
  * BIGINTs (halves stay integral); the single float divide+sqrt runs
  * once per group, rounded 6 dp (ρ is invariant to the ×2 scaling).
  *
  * Moment arithmetic is HYBRID for exactness AND codegen speed: a
  * cheap pre-agg (one scan + hash agg of the filtered base) finds the
  * largest group size n_max; when n_max ≤ [[LongPathMaxN]] every
  * per-row product provably fits BIGINT (mx2 ≤ 2n so products ≤ 4n²
  * and group sums ≤ 4n³ < 2^63 for n ≤ 1.2e6) and the hot per-row
  * path stays on codegen long arithmetic — only the per-GROUP sums
  * widen to DECIMAL for the final cross products. Larger groups take
  * the all-DECIMAL face: exact through n·sxy − sx·sy (≤ 4n⁴, inside
  * the 38-digit cap) for n ≤ ~1.2e9 rows per group; past that rho
  * turns NULL (loud), never silently wrong. Both paths are exact
  * integer arithmetic — bit-identical results by construction.
  */
object Spearman {

  /** Largest per-group row count for which 2·midrank moment sums
    * provably fit BIGINT: sums reach 4n³, and 4·(1.2e6)³ ≈ 6.9e18 <
    * 2^63 ≈ 9.22e18 (wrap starts at n ≈ 1.32e6 — margin kept).
    */
  private[graft] val LongPathMaxN = 1200000L

  /** `(group, n, rho)` per group; `rho` NULL when either variable is
    * constant within the group (zero rank variance).
    */
  def correlation(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame =
    correlation(df, groupCol, xCol, yCol, LongPathMaxN)

  /** Test face: `longPathMaxN = 0` forces the DECIMAL moments so specs
    * can pin path equality without 1.3e6-row fixtures everywhere.
    */
  private[graft] def correlation(df: DataFrame, groupCol: String,
                                 xCol: String, yCol: String,
                                 longPathMaxN: Long): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(xCol).as("x"),
        col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    // path pick: one small eager job (scan + hash agg to group counts);
    // its cost is a fraction of the midrank passes it gates
    val nMax = base.groupBy("g").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("m")).head() match {
        case r if r.isNullAt(0) => 0L // empty input: either path works
        case r => r.getLong(0)
      }
    val rx = midranks2(base, "x", "mx2")
    val ry = midranks2(base, "y", "my2")
    val ranked = base
      .join(rx, Seq("g", "x")).join(ry, Seq("g", "y"))
    def cd(c: Column) = c.cast("decimal(19,0)")
    val m = if (nMax <= longPathMaxN) {
      // hot path: per-row products in codegen long arithmetic (exact by
      // the LongPathMaxN bound), widened to DECIMAL per GROUP only
      ranked.groupBy("g").agg(
        count(lit(1)).as("n"),
        sum(col("mx2")).as("__sxl"),
        sum(col("my2")).as("__syl"),
        sum(col("mx2") * col("my2")).as("__sxyl"),
        sum(col("mx2") * col("mx2")).as("__sxxl"),
        sum(col("my2") * col("my2")).as("__syyl"))
        .select(col("g"), col("n"),
          cd(col("__sxl")).as("sx"), cd(col("__syl")).as("sy"),
          cd(col("__sxyl")).as("sxy"), cd(col("__sxxl")).as("sxx"),
          cd(col("__syyl")).as("syy"))
    } else ranked.groupBy("g").agg(
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
