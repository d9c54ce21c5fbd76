package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus keyness — which terms are DISTINCTIVE of a document group
  * versus the rest of the corpus (Monroe, Colaresi & Quinn 2008,
  * "Fightin' Words": smoothed log-odds-ratio z-scores; here with the
  * Haldane–Anscombe +0.5 smoothing so the statistic is a closed-form
  * expression over four exact integer counts). The raw-frequency and
  * tf-idf rankings both drown in stopwords; the log-odds z-score
  * normalizes by the binomial variance so rare-but-exclusive and
  * common-but-skewed terms compete on one scale.
  *
  * Scale shape: token explode → ONE (group, term) hash aggregation
  * (map-side combining), then two tiny rollups (per-group totals: one
  * row per group; per-term totals: vocabulary-sized) hash-joined
  * back. The z computation is a single codegen'd projection over four
  * BIGINT counts — the doubles exist only inside one expression and
  * are rounded to 6 dp before they ever rank or leave the operator,
  * so cross-engine ULP noise cannot reorder results. Top-k per group
  * is a WindowGroupLimit (no global sort).
  */
object Keyness {

  /** `(group, term, y_g, y_rest, z)`: the `k` highest-z terms per
    * group (ties broken by term), where `z` is the +0.5-smoothed
    * log-odds-ratio z-score of the term in `group` vs all other
    * groups, rounded to 6 dp. `tokensCol` must be an array of term
    * strings. Terms are scored only in groups where they OCCUR (the
    * sparse frame — a dense group×vocabulary cross would shuffle
    * |groups|·|vocab| rows for scores that can never rank in a top-k
    * of distinctive-POSITIVE terms; absent terms have z < 0).
    */
  def topDistinctive(docs: DataFrame, groupCol: String, tokensCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol).as("grp"),
        explode(col(tokensCol)).as("term"))
      .groupBy("grp", "term").agg(count(lit(1)).as("y_g"))
    val grpTot = counts.groupBy("grp").agg(sum("y_g").as("n_g"))
    val termTot = counts.groupBy("term").agg(sum("y_g").as("y_all"))
    val total = counts.agg(sum("y_g").as("n_all"))
    def d(c: Column) = c.cast("double")
    val scored = counts
      .join(grpTot, "grp")
      .join(termTot, "term")
      .crossJoin(broadcast(total)) // 1-row total — broadcast anchor
      .withColumn("y_rest", col("y_all") - col("y_g"))
      .withColumn("n_rest", col("n_all") - col("n_g"))
      .withColumn("z", round(
        (log((d(col("y_g")) + 0.5) / (d(col("n_g") - col("y_g")) + 0.5)) -
          log((d(col("y_rest")) + 0.5) / (d(col("n_rest") - col("y_rest")) + 0.5))) /
          sqrt(lit(1.0) / (d(col("y_g")) + 0.5) + lit(1.0) / (d(col("y_rest")) + 0.5)),
        6))
    val w = Window.partitionBy("grp").orderBy(col("z").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)) // WindowGroupLimit
      .filter(col("rank") <= k)
      .select(col("grp"), col("rank").cast("long").as("rank"), col("term"),
        col("y_g"), col("y_rest"), col("z"))
  }
}
