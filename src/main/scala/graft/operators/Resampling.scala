package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Resampling-based uncertainty — the Poisson bootstrap and split
  * conformal prediction, the two distribution-free interval methods a
  * pipeline needs once its metrics leave textbook formulas (a
  * trimmed ratio, a deduped mean) or its "model" is an arbitrary
  * predictor.
  *
  * Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
  * for massive data streams"): the classic n-out-of-n bootstrap is
  * unshardable (a resample needs global coordination), but Poisson(1)
  * per-row replicate weights approximate multinomial counts with NO
  * coordination — each row decides its weight in every replicate from
  * a hash of its own id, in ONE pass. Exactly the q58/q130 md5
  * content-hash discipline: deterministic, engine-portable,
  * reproducible on any replica of the data.
  *
  * Scale shape: one scan; each row explodes into `reps` (replicate,
  * weight) contributions that collapse into `reps` rows by map-side
  * partial aggregation — the shuffle carries reps × |partitions|
  * partial rows, never data. All sums are exact DECIMAL; the replicate
  * means are one float tree each; the CI bounds are exact rank
  * selections over the reps-row frame.
  */
object Resampling {

  /** Poisson(1) inverse CDF over a 48-bit uniform, as exact integer
    * thresholds `floor(CDF_k · 2^48)` — integer comparison only, no
    * float; the literals are part of the operator's portable
    * definition. P(w > 7) ≈ 1e-5 truncates to 7 (bias far below the
    * resampling noise this estimates).
    */
  private val PoissonThresholds: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L,
    276130285696162L, 280444821410164L, 281307728552965L,
    281451546410098L)

  private def poissonWeight(u: Column): Column =
    PoissonThresholds.zipWithIndex.foldRight(lit(7L): Column) {
      case ((t, k), rest) => when(u < t, k.toLong).otherwise(rest)
    }

  /** Percentile-bootstrap CI for the MEAN of `valueCol` (an integer
    * measure, e.g. cents): one row
    * `(n, reps, mean, ci_lo, ci_hi)` where mean is the full-sample
    * mean (exact sums, one float tree) and the bounds are the
    * rank-`ceil(α/2·reps)` / rank-`ceil((1−α/2)·reps)` replicate
    * means. `idCol` must be a stable unique row id — it seeds the
    * per-replicate weights. `alphaPpm` is α in parts-per-million
    * (100000 = 90% CI), kept integer so the rank arithmetic is exact.
    */
  def poissonBootstrapCi(df: DataFrame, idCol: String, valueCol: String,
                         reps: Int = 40,
                         alphaPpm: Long = 100000L): DataFrame = {
    val base = df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__id").isNotNull && col("__v").isNotNull)
    val rep = base
      // the ×reps explode multiplies per-row CPU (one md5 per
      // replicate per row) — spread the input first: a small
      // single-file scan is ONE task, and the whole replicate fan-out
      // would serialize on it (guide §2.5; measured at sf0.1: the 40×
      // md5 pass was a single 6.1 s task, 0.5 s spread over 32)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__b", explode(expr(s"sequence(0L, ${reps - 1}L)")))
      .withColumn("__u",
        conv(substring(md5(concat(col("__id"), lit("_"),
          col("__b").cast("string"))), 1, 12), 16, 10).cast("long"))
      .withColumn("__w", poissonWeight(col("__u")))
      .groupBy(col("__b"))
      .agg(sum((col("__w") * col("__v")).cast("decimal(23,0)")).as("__sv"),
        sum(col("__w")).as("__sw"))
      // a replicate with zero total weight (possible only for tiny n)
      // has no mean — drop it from the rank frame rather than sort a
      // NULL to an arbitrary end
      .filter(col("__sw") > 0L)
      .withColumn("__mean",
        round(col("__sv").cast("double") / col("__sw").cast("double"), 6)
          + 0.0)
    // exact integer ranks: ceil(a·b / 1e6) = (a·b + 999999) DIV 1e6
    val loRank = (alphaPpm / 2L * reps + 999999L) / 1000000L
    val hiRank = ((1000000L - alphaPpm / 2L) * reps + 999999L) / 1000000L
    val byMean = Window.orderBy(col("__mean"), col("__b"))
    val ranked = rep.withColumn("__r", row_number().over(byMean))
    // aggregate the 0-or-1-row rank selections to ALWAYS-1-row scalar
    // frames (max over an empty frame is one NULL row), so a degenerate
    // input where every replicate dropped still emits the summary row
    // with NULL bounds — the oracle's scalar-subquery behavior
    val lo = ranked.filter(col("__r") === math.max(1L, loRank))
      .agg(max(col("__mean")).as("ci_lo"))
    val hi = ranked.filter(col("__r") === math.min(reps.toLong, hiRank))
      .agg(max(col("__mean")).as("ci_hi"))
    base.agg(count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(19,0)")).as("__s"))
      .withColumn("reps", lit(reps.toLong))
      .withColumn("mean",
        round(col("__s").cast("double") / col("n").cast("double"), 6) + 0.0)
      .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(col("n"), col("reps"), col("mean"), col("ci_lo"), col("ci_hi"))
  }

  /** Split conformal prediction intervals per key, with a coverage
    * audit: the predictor is each key's exact CALIBRATION lower median
    * (integer, so every downstream quantity stays exact); the
    * nonconformity score is `|y − median_k|`; `q̂_k` is the
    * `ceil((n_cal+1)(1−α))`-th smallest calibration score (the finite-
    * sample-valid conformal rank, exact integer arithmetic); TEST rows
    * are covered when their score is ≤ q̂_k. When the conformal rank
    * exceeds n_cal (tiny calibration sets) the interval is infinite —
    * q̂ NULL, everything covered — the estimator's honest answer.
    *
    * Scale shape: medians via the budget-bounded keyed drill
    * ([[ExactSelection]], GROUP-like keys by contract); the rank
    * selection runs on the per-(key, distinct score) count frame (the
    * [[MannWhitney]] midrank discipline — value-domain-sized, never
    * row-sized); the audit is one broadcast tag join + hash agg.
    * Output: `(keyCol, n_calib, n_test, median, qhat, n_covered,
    * coverage_ppm)`.
    */
  def splitConformal(df: DataFrame, keyCol: String, valueCol: String,
                     calibCol: String,
                     alphaPpm: Long = 100000L): DataFrame = {
    val v = df.select(col(keyCol).as("__k"),
        col(valueCol).cast("long").as("__y"),
        col(calibCol).cast("boolean").as("__cal"))
      .filter(col("__k").isNotNull && col("__y").isNotNull &&
        col("__cal").isNotNull)
    val calib = v.filter(col("__cal")).select(col("__k"), col("__y"))
    val med = ExactSelection.lowerMedianPerKey(calib, "__k", "__y")
      .select(col("__k"), col("n_values").as("n_calib"),
        col("value").as("median"))
    val scored = calib.join(broadcast(med.select(col("__k"), col("median"))),
        Seq("__k"))
      .select(col("__k"), abs(col("__y") - col("median")).as("__d"))
    // conformal rank r = ceil((n+1)(1−α)) in exact ppm integers
    val perD = scored.groupBy(col("__k"), col("__d"))
      .agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy(col("__k")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = perD
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .join(broadcast(med.select(col("__k"), col("n_calib"))), Seq("__k"))
      // exact integer ceil in ppm: long headroom to n_calib < 9.2e12
      .withColumn("__r", expr(
        s"((n_calib + 1) * ${1000000L - alphaPpm}L + 999999L) DIV 1000000L"))
      .filter(col("__r") <= col("n_calib") &&
        col("__cum") - col("__c") < col("__r") &&
        col("__r") <= col("__cum"))
      .select(col("__k"), col("__d").as("qhat"))
    val test = v.filter(!col("__cal")).select(col("__k"), col("__y"))
      .join(broadcast(med.select(col("__k"), col("median"))), Seq("__k"))
      .join(broadcast(qhat), Seq("__k"), "left")
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("qhat").isNull ||
          abs(col("__y") - col("median")) <= col("qhat"), 1L)
          .otherwise(0L)).as("n_covered"))
    med.join(qhat, Seq("__k"), "left").join(test, Seq("__k"), "left")
      .select(col("__k").as(keyCol), col("n_calib"),
        coalesce(col("n_test"), lit(0L)).as("n_test"), col("median"),
        col("qhat"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        when(coalesce(col("n_test"), lit(0L)) > 0L,
          expr("1000000 * n_covered DIV n_test")).as("coverage_ppm"))
      .orderBy(col(keyCol))
  }
}
