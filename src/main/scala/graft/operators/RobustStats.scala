package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort-free per-key ROBUST location/scale — median and MAD (median
  * absolute deviation), the outlier-resistant (median, MAD) pair that
  * replaces (mean, stddev) on heavy-tailed pipeline measures (doc
  * lengths, latencies, spend): one contaminated shard shifts a mean
  * arbitrarily but moves a median by at most one rank.
  *
  * Built entirely on [[ExactSelection]]'s budget-bounded keyed drill:
  *  - drill 1: per-key lower median `m_k`;
  *  - one broadcast join tags each row with `|v − m_k|` (the key
  *    frame is GROUP-like by the drill's contract, so it broadcasts);
  *  - drill 2: per-key lower median of the deviations = MAD.
  *
  * No sort, no window, no data-sized shuffle anywhere — ~2× the
  * drill's scan count, each scan one hash aggregation. Every output
  * is an exact integer (q109's global MAD discipline), so an external
  * SQL engine replays it bit-for-bit.
  *
  * Returns `(keyCol, n_values, median, mad)`; NULL keys/values drop
  * (no group, no median).
  */
object RobustStats {

  def madPerKey(df: DataFrame, keyCol: String, valueCol: String,
                maxBuckets: Int = 1 << 16,
                driverRowBudget: Long =
                  ExactSelection.DefaultDriverRowBudget): DataFrame = {
    val med = ExactSelection.lowerMedianPerKey(df, keyCol, valueCol,
        maxBuckets, driverRowBudget)
      .select(col(keyCol), col("n_values"), col("value").as("median"))
    val dev = df
      .join(broadcast(med.select(col(keyCol), col("median"))), Seq(keyCol))
      .select(col(keyCol),
        abs(col(valueCol).cast("long") - col("median")).as("__dev"))
    val mad = ExactSelection.lowerMedianPerKey(dev, keyCol, "__dev",
        maxBuckets, driverRowBudget)
      .select(col(keyCol), col("value").as("mad"))
    med.join(mad, Seq(keyCol)).orderBy(col(keyCol))
  }

  /** [[madPerKey]] plus the per-key count of rows whose deviation
    * exceeds `k × MAD` — the classic robust outlier screen, exact
    * integer comparison (`|v − median| > k·mad`; a zero-MAD key flags
    * every deviating row, the q109 convention). Returns
    * `(keyCol, n_values, median, mad, n_outliers)`.
    */
  def madOutliersPerKey(df: DataFrame, keyCol: String, valueCol: String,
                        k: Long = 3L,
                        maxBuckets: Int = 1 << 16,
                        driverRowBudget: Long =
                          ExactSelection.DefaultDriverRowBudget): DataFrame = {
    val stats = madPerKey(df, keyCol, valueCol, maxBuckets, driverRowBudget)
    val flagged = df
      .join(broadcast(stats.select(col(keyCol), col("median"), col("mad"))),
        Seq(keyCol))
      .filter(abs(col(valueCol).cast("long") - col("median")) >
        lit(k) * col("mad"))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_outliers"))
    stats.join(flagged, Seq(keyCol), "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .orderBy(col(keyCol))
  }
}
