package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics curve behind "do users
  * come back": users are cohorted by the period of their FIRST
  * activity, and each later period's cohort survivors are counted.
  *
  * Periods are caller-supplied INTEGERS (e.g. months since epoch:
  * `year·12 + month`) so every number here is exact integer
  * arithmetic — retention is published as exact parts-per-million via
  * integer division, never a float ratio (bit-portable across
  * engines, the house exactness doctrine).
  *
  * Scale shape: one hash agg for first-periods (user-sized), one
  * distinct over (user, period) (activity-sized), one equi-join on
  * user, two more hash aggs — no window, no collect, no cross join.
  */
object Retention {

  /** `(cohort, k, n_active, cohort_size, retention_ppm)` for every
    * (cohort period, periods-since-cohort k ≥ 0) with activity;
    * `k = 0` rows carry retention_ppm = 1000000 by construction.
    * `retention_ppm = n_active · 1e6 DIV cohort_size` (exact).
    */
  def cohortRetention(df: DataFrame, userCol: String,
                      periodCol: String): DataFrame = {
    val firstP = df.select(col(userCol).as("u"), col(periodCol).as("p"))
      .groupBy("u").agg(min(col("p")).as("cohort"))
    val active = df.select(col(userCol).as("u"), col(periodCol).as("p"))
      .distinct()
    val counts = active.join(firstP, Seq("u"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("k"))
      .agg(count(lit(1)).as("n_active")) // (u, p) distinct ⇒ count = users
    val sizes = firstP.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    counts.join(sizes, Seq("cohort"))
      .withColumn("retention_ppm",
        expr("n_active * 1000000 DIV cohort_size"))
      .select(col("cohort"), col("k"), col("n_active"),
        col("cohort_size"), col("retention_ppm"))
  }
}
