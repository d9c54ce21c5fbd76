package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Score-calibration audit (the reliability diagram + Brier
  * decomposition input — Murphy 1973; Niculescu-Mizil & Caruana,
  * ICML'05): given a predicted probability and a binary outcome per
  * row, bucket the scores and compare each bucket's MEAN PREDICTION
  * against its OBSERVED positive rate — the "when the model says 30%
  * does it happen 30% of the time" question every score consumer
  * (curation thresholds, sampling weights, router gates) should ask
  * before trusting a score column at 100 TB.
  *
  * Exactness discipline: scores enter as exact parts-per-million
  * integers (the caller renders their rational score via integer
  * `DIV`, e.g. `1000000 * hits DIV total`), so bin assignment, mean
  * prediction, observed rate and the Brier sum are all integer/DECIMAL
  * arithmetic — cross-engine hash-identical with no float summation
  * anywhere. One hash aggregation over the rows; the published frame
  * is bin-count-sized.
  */
object Calibration {

  /** Reliability bins over `(scorePpm, label)`: rows bucket by
    * `scorePpm * bins DIV 1000000` (score 1.0 folds into the top
    * bin), and each bin publishes `n`, positives, the exact-ppm mean
    * prediction and observed rate, their signed gap, and the bin's
    * Brier contribution `Σ (scorePpm − label·1e6)²` (exact, published
    * as DECIMAL(38,0) in e-12 units — a long would wrap at ~9.2e6
    * max-gap rows per bin). Total Brier score = `Σ brier_e12 / n`
    * over bins / 1e12.
    */
  def reliabilityBins(df: DataFrame, scorePpmCol: Column, labelCol: Column,
                      bins: Int): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val b = least(expr(s"(__sc * ${bins}L) div 1000000"), lit(bins - 1L))
    // both running sums widen to DECIMAL before they can cross 2^63
    // (Spark's long sum wraps silently; the doctrine is DECIMAL first,
    // narrow only values that provably fit): the score sum crosses at
    // ~9.2e12 max-score rows per bin, the Brier sum at ~9.2e6
    // max-gap rows — real row counts at the scale this targets.
    // brier_e12 stays DECIMAL(38,0) in the OUTPUT for the same reason.
    df.select(scorePpmCol.cast("long").as("__sc"),
        labelCol.cast("int").cast("long").as("__y"))
      .withColumn("bin", b)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        sum(col("__sc").cast("decimal(19,0)")).as("__ssc"),
        sum(((col("__sc") - col("__y") * lit(1000000L)) *
          (col("__sc") - col("__y") * lit(1000000L)))
          .cast("decimal(38,0)")).as("__sq"))
      .withColumn("mean_pred_ppm", expr("__ssc div n")) // ppm ≤ 1e6: long-safe
      .withColumn("obs_rate_ppm", expr("(n_pos * 1000000) div n"))
      .withColumn("gap_ppm", col("mean_pred_ppm") - col("obs_rate_ppm"))
      .withColumn("brier_e12", col("__sq").cast("decimal(38,0)"))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_pred_ppm"),
        col("obs_rate_ppm"), col("gap_ppm"), col("brier_e12"))
      .orderBy(col("bin"))
  }
}
