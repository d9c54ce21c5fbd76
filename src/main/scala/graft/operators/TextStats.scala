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

  /** Jensen–Shannon divergence of each group's token distribution from
    * the corpus-wide distribution — the bounded, symmetric drift score
    * (0 = identical mix, ln 2 = disjoint vocabularies) that
    * complements PSI (which needs binning) and KS (which needs an
    * ordered domain). Returns `(groupCol, n_tokens, jsd)`.
    *
    * Let P = group distribution (c/n), Q = corpus distribution (C/N),
    * M = (P+Q)/2. Tokens absent from the group contribute
    * `½·Q_w·ln 2` in closed form (P_w = 0 ⇒ M_w = Q_w/2), so the join
    * only materializes the group's OWN vocabulary:
    * `jsd = ½·ΣA/n + ½·ΣB/N + ½·ln2·(1 − Σ_in C_w / N)` with
    * `A = c·round(ln(2cN/(cN+Cn)),6)`, `B = C·round(ln(2Cn/(cN+Cn)),6)`.
    *
    * Exactness doctrine: every ln term rounds to 6 dp and accumulates
    * in DECIMAL(28,6); the cN / Cn products run in DECIMAL(38,0) so
    * they can never wrap a BIGINT at corpus scale; ln 2 is pinned to
    * the 6-dp literal 0.693147 on both engines. Scale shape: two hash
    * aggregations over token occurrences, a broadcast of the per-group
    * totals (|groups| rows) and the 1-row corpus total — no window, no
    * self-join; cost is O(token occurrences).
    */
  def jsDivergence(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val toks = docs.select(col(groupCol),
      explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("__w"))
    // the (group, token, count) frame feeds FOUR consumers (ns, cw,
    // tot, the join) — without persistence each one re-scans and
    // re-tokenizes the corpus (plan-read: 4× FileScan). Group-sized
    // token counts, not the corpus; released via Retained.releaseAll.
    val cs = Retained.track(toks.groupBy(col(groupCol), col("__w"))
      .agg(count(lit(1)).as("__c")).persist())
    val ns = cs.groupBy(col(groupCol)).agg(sum(col("__c")).as("__n"))
    val cw = cs.groupBy(col("__w")).agg(sum(col("__c")).as("__cw"))
    val tot = cw.agg(sum(col("__cw")).as("__bigN"))
    val joined = cs.join(cw, Seq("__w"))
      .join(broadcast(ns), Seq(groupCol))
      .crossJoin(broadcast(tot))
      .withColumn("__cn", (dec(col("__c")) * dec(col("__bigN"))).cast("decimal(38,0)"))
      .withColumn("__cwn", (dec(col("__cw")) * dec(col("__n"))).cast("decimal(38,0)"))
      .withColumn("__den", (col("__cn") + col("__cwn")).cast("decimal(38,0)"))
      .withColumn("__ta", (dec(col("__c")) * round(log(
        (lit(2).cast("double") * col("__cn").cast("double")) / col("__den").cast("double")), 6)
        .cast("decimal(18,6)")).cast("decimal(28,6)"))
      .withColumn("__tb", (dec(col("__cw")) * round(log(
        (lit(2).cast("double") * col("__cwn").cast("double")) / col("__den").cast("double")), 6)
        .cast("decimal(18,6)")).cast("decimal(28,6)"))
    joined.groupBy(col(groupCol))
      .agg(first(col("__n")).as("n_tokens"),
        first(col("__bigN")).as("__N2"),
        sum(col("__ta")).cast("decimal(28,6)").as("__sa"),
        sum(col("__tb")).cast("decimal(28,6)").as("__sb"),
        sum(col("__cw")).as("__cin"))
      .select(col(groupCol), col("n_tokens"),
        round(lit(0.5) * (col("__sa").cast("double") / col("n_tokens").cast("double"))
          + lit(0.5) * (col("__sb").cast("double") / col("__N2").cast("double"))
          + lit(0.5) * lit(0.693147) * (lit(1.0)
            - col("__cin").cast("double") / col("__N2").cast("double"))
          + lit(0.0), 6).as("jsd"))
  }
}
