package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the classic fabricated-data / broken-
  * pipeline detector (Benford 1938; Nigrini's forensic-accounting
  * use): natural multi-scale positive quantities put digit d first
  * with probability log10(1+1/d); a feed whose digits drift from that
  * curve was truncated, defaulted, or synthesized. Standard data-ops
  * gate on ingest.
  *
  * Scale shape: one hash aggregation on (group, digit) + a dense
  * 9-digit frame per group (groups × 9 rows) for the χ² rollup.
  * Exactness discipline: observed counts are BIGINTs; each χ² term is
  * rounded to 6 dp and summed in DECIMAL so the 9-term sum is
  * order-independent (a raw double sum would vary with aggregation
  * order); expected shares ship as exact ppm integers.
  */
object Benford {

  /** `(groupCols..., digit, n_obs, expected_ppm, chi2)` — one row per
    * (group, first digit 1-9), `chi2` the group's Pearson statistic
    * repeated on each of its rows. Rows with `valueCol < 1` are
    * excluded (no stable first digit).
    */
  def firstDigitAudit(df: DataFrame, groupCols: Seq[String],
                      valueCol: String): DataFrame = {
    val gCols = groupCols.map(col)
    val obs = df.filter(col(valueCol) >= 1)
      .withColumn("digit",
        substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
          .cast("int"))
      .groupBy(gCols :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_obs"))
    // dense digit frame: zero-count digits still contribute (obs−exp)²/exp
    val digits = explode(array((1 to 9).map(lit): _*)).as("digit")
    val dense = obs.select(gCols: _*).distinct().select(gCols :+ digits: _*)
      .join(obs, groupCols :+ "digit", "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("__p", log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
      .withColumn("expected_ppm", round(col("__p") * 1e6).cast("long"))
    val totals = dense.groupBy(gCols: _*).agg(sum("n_obs").as("__n"))
    val terms = dense.join(broadcast(totals), groupCols)
      .withColumn("__exp", col("__n").cast("double") * col("__p"))
      // 6-dp DECIMAL terms make the 9-term sum order-independent
      .withColumn("__term",
        round((col("n_obs").cast("double") - col("__exp")) *
          (col("n_obs").cast("double") - col("__exp")) / col("__exp"), 6)
          .cast("decimal(18,6)"))
    val chi2 = terms.groupBy(gCols: _*)
      .agg((sum(col("__term")).cast("double") + lit(0.0)).as("chi2"))
    terms.select(gCols :+ col("digit") :+ col("n_obs") :+
        col("expected_ppm"): _*)
      .join(broadcast(chi2), groupCols)
  }
}
