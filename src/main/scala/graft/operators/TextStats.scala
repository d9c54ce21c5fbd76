package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus statistics beyond per-row Column functions: per-document
  * Shannon entropy and corpus-level PMI collocations. Both are pure
  * hash-aggregation shapes (map-side partials, no windows, no
  * collects) and publish DECIMAL-exact or 6-dp-rounded values so a SQL
  * oracle reproduces them bit-for-bit.
  */
object TextStats {

  /** Per-document token-distribution entropy pieces:
    * `(idCol, n_tokens, n_distinct, sum_clogp)` where
    * `sum_clogp = Σ_w c_w · round(ln(c_w/n), 6)` summed in DECIMAL
    * (so H = −sum_clogp/n; the SUM is published because it is exact).
    * A one-token-repeated doc scores 0; varied text goes negative.
    * Docs with zero tokens produce no row.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("__w"))
    val counts = toks.groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val n = counts.groupBy(col(idCol))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("n_distinct"))
    counts.join(n, Seq(idCol))
      .withColumn("__t", col("__c") * round(log(
        col("__c").cast("double") / col("__n").cast("double")), 6)
        .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(first(col("__n")).as("n_tokens"),
        first(col("n_distinct")).as("n_distinct"),
        (sum(col("__t")).cast("double") + lit(0.0)).as("sum_clogp"))
  }

  /** Corpus-level adjacent-bigram PMI against the unigram distribution:
    * `pmi = round(ln((c12·Nu·Nu) / (Nb·c1·c2)), 6)`, keeping pairs with
    * `c12 >= minCount`, top `k` under the total order
    * (pmi desc, w1, w2) via TakeOrdered. Returns (w1, w2, c12, pmi).
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Int, k: Int): DataFrame = {
    val toks = docs.select(
      graft.functions.TextAnalysis.tokens(col(textCol)).as("__t"))
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("__t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__t)-2), i -> struct(__t[i] AS w1, __t[i+1] AS w2))"))
        .as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = bi.agg(sum(col("c12")).as("nb"))
    bi.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("pmi", round(log(
        (col("c12").cast("double") * col("nu").cast("double") * col("nu").cast("double")) /
          (col("nb").cast("double") * col("c1").cast("double") * col("c2").cast("double"))), 6))
      .select(col("w1"), col("w2"), col("c12"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Corpus-order novelty — per document, how many of its distinct
    * token trigrams appear for the FIRST time in the corpus (by id
    * order): the diminishing-returns curve of adding more data from
    * the same source, and the dual of dedup (a doc whose novelty is
    * ~0 is information the corpus already has even if no single pair
    * crosses a near-dup threshold). Published as exact integers +
    * ppm (integer division — no float ratio).
    *
    * Scale shape: distinct (doc, trigram) pairs, one min-agg per
    * trigram type (first bearer), one equi-join back, one per-doc
    * agg — no window, no self-join; cost is O(trigram occurrences).
    */
  def firstSeenNovelty(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
    val tri = toks.select(col(idCol), explode(expr(
        "transform(sequence(0, size(__t)-3), i -> concat_ws(' ', __t[i], __t[i+1], __t[i+2]))"))
        .as("__g"))
      .distinct()
    val firstDoc = tri.groupBy(col("__g"))
      .agg(min(col(idCol)).as("__first"))
    tri.join(firstDoc, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri_types"),
        sum(when(col(idCol) === col("__first"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_ppm",
        expr("n_novel * 1000000 DIV n_tri_types"))
  }

  /** Per-document WITHIN-doc repetition — the token-trigram redundancy
    * signal quality filters cut on (looping generations and template
    * spam repeat trigrams; natural prose mostly does not):
    * `(idCol, n_trigrams, n_distinct, repetition_ratio)` with
    * `repetition_ratio = round(1 − distinct/total, 6)`. Docs with
    * fewer than 3 tokens produce no row. Two chained hash aggs
    * (per-(doc, trigram) counts, then per-doc) — no window, no
    * countDistinct shuffle beyond the same two exchanges.
    */
  def trigramRepetition(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // partition the COMPACT doc rows by id BEFORE the explode: both
    // downstream groupBys cluster on (id, …) ⊇ (id), so they run
    // exchange-free — one doc-sized shuffle instead of two
    // trigram-sized ones
    val toks = docs.select(col(idCol),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
      .repartition(col(idCol))
    val tri = toks.select(col(idCol), explode(expr(
        "transform(sequence(0, size(__t)-3), i -> concat_ws(' ', __t[i], __t[i+1], __t[i+2]))"))
        .as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
    tri.groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_trigrams"),
        count(lit(1)).as("n_distinct"))
      .withColumn("repetition_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_trigrams").cast("double"), 6))
  }
}
