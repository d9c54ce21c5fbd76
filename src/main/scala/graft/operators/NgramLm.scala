package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the statistical cousin of
  * the heuristic quality signals (q19/q60/q95): documents whose token
  * transitions are improbable under the corpus's own bigram model score
  * low (gibberish, boilerplate soup, wrong-language text), the classic
  * perplexity-style filter of LLM data pipelines.
  *
  * Model: Laplace-smoothed bigram probabilities estimated from the
  * corpus itself, `p(w2|w1) = (c12 + 1) / (ctx1 + V)` with `c12` the
  * bigram count, `ctx1 = Σ_w c(w1,w)` the context count derived from
  * the bigram table, and `V` the distinct-token vocabulary size.
  *
  * Every stage distributes: bigram extraction is a scan-stage HOF over
  * per-doc token arrays; the count/context tables are hash
  * aggregations; scoring joins doc bigrams to the model on (w1,w2) /
  * (w1) — co-partitioned hash joins, AQE-broadcastable when the model
  * is small; the per-doc reduce is one hash aggregation. Nothing is
  * ever collected (V is one scalar `count`).
  *
  * Determinism: each bigram's log-probability is rounded to 6 decimals
  * and summed in DECIMAL, so per-doc totals are exact and
  * engine-independent (log arguments are ratios of exact integers —
  * identical doubles on any engine; a ≤1-ulp libm difference in `ln`
  * survives the rounding only on astronomically unlikely boundaries).
  */
object NgramLm {

  /** (doc_id, n_bigrams, sum_logp) per document with >= 1 bigram,
    * self-scored under the corpus bigram model. `sum_logp` is the total
    * 6-dp-rounded natural-log probability (divide by `n_bigrams` for
    * the per-token average; the SUM is published because it is exact —
    * a 6-dp DECIMAL total casts to double losslessly, whereas an
    * average lands on .5e-6 rounding boundaries whenever the count
    * divides a power of ten). Higher = more typical text.
    */
  def scoreByBigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      graft.functions.TextAnalysis.tokens(col(textCol)).as("__t"))
    val vocab = toks.select(explode(col("__t")).as("__w")).distinct().count()
    val bi = toks.filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__t)-2), i -> struct(__t[i] AS w1, __t[i+1] AS w2))"))
        .as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    // the model is |bigram vocab|-sized (≪ corpus); persist it so the
    // scoring join and the context roll-up don't each re-scan the
    // corpus (MEMORY_AND_DISK: spills, never fails). Registered with
    // Retained — callers release via Retained.releaseAll(spark) after
    // the consuming action
    val counts = Retained.track(
      bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ctx = counts.groupBy(col("w1")).agg(sum(col("c12")).as("ctx1"))
    bi.join(counts, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .withColumn("__lp",
        round(log((col("c12") + 1).cast("double") /
          (col("ctx1") + lit(vocab)).cast("double")), 6).cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__lp")).cast("double") + lit(0.0)).as("sum_logp"))
  }
}
