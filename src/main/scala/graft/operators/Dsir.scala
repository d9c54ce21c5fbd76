package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a small
  * target domain by scoring each under a pair of hashed n-gram
  * bag-of-words models — `log w(doc) = Σ_features c_f·(ln p_f − ln q_f)`
  * with `p` fit on the target slice and `q` on the raw pool — then keep
  * the top mass. The hashing step is what makes this a 100 TB operator:
  * the feature space collapses to a fixed `numBuckets`-row table that
  * broadcasts, so scoring is a scan + one broadcast join + one hash
  * aggregation, and nothing corpus-sized ever shuffles.
  *
  * Determinism / engine-portability:
  *  - features are unigrams ∪ adjacent bigrams, bucketed by the first
  *    8 hex digits of md5 (same content-keyed scheme as the q58 hash
  *    split) — identical on any engine, any partitioning;
  *  - each bucket's log-ratio is a SINGLE `ln` of a ratio of exact
  *    int64 products (Laplace-smoothed counts), rounded to 6 decimals
  *    into DECIMAL(18,6); per-doc weights are DECIMAL sums of
  *    count×delta — exact, so the selection ORDER (weight desc, id) is
  *    total and reproducible;
  *  - the selection rank comes from [[Ordinals.withOrderedOrdinal]] —
  *    a range-partitioned distributed sort, not a global window.
  */
object Dsir {

  /** Per-feature hash bucket in [0, numBuckets). */
  private def bucketOf(f: Column, numBuckets: Int): Column =
    conv(substring(md5(f), 1, 8), 16, 10).cast("long") % numBuckets

  /** Explodes a token-array column to one row per unigram and adjacent
    * bigram (bigrams joined with a single space).
    */
  private def features(toks: DataFrame, tokCol: String): DataFrame = {
    val uni = toks.select(col("*"), explode(col(tokCol)).as("__f"))
    val bi = toks.filter(size(col(tokCol)) >= 2)
      .select(col("*"), explode(expr(
        s"transform(sequence(0, size($tokCol)-2), " +
          s"i -> concat($tokCol[i], ' ', $tokCol[i+1]))")).as("__f"))
    uni.unionByName(bi).drop(tokCol)
  }

  /** Scores every non-target document of `docs` against the
    * target-vs-raw hashed-feature models and ranks them for selection.
    *
    * Returns `(idCol, n_feats, weight, sel_rank, selected)` — one row
    * per raw (non-target) document, `weight` the exact DECIMAL
    * importance log-weight as a double, `sel_rank` the 1-based rank
    * under (weight desc, id), `selected` true for the top
    * `ceil(keepFrac · n_raw)` rows.
    */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
                         isTarget: Column, numBuckets: Int = 64,
                         keepFrac: Double = 0.25): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac in (0,1], got $keepFrac")
    val toks = docs.select(col(idCol), isTarget.as("__tgt"),
      graft.functions.TextAnalysis.tokens(col(textCol)).as("__t"))
    val feats = features(toks, "__t")
      .withColumn("__b", bucketOf(col("__f"), numBuckets)).drop("__f")

    // bucket-count model tables: numBuckets rows each — broadcastable
    // regardless of corpus size (this is the whole point of hashing)
    val tgtCnt = feats.filter(col("__tgt")).groupBy(col("__b"))
      .agg(count(lit(1)).as("__tc"))
    val rawCnt = feats.filter(!col("__tgt")).groupBy(col("__b"))
      .agg(count(lit(1)).as("__rc"))
    val totals = feats.groupBy(col("__tgt")).agg(count(lit(1)).as("__n"))
      .groupBy().agg(
        sum(when(col("__tgt"), col("__n")).otherwise(0L)).as("__T"),
        sum(when(!col("__tgt"), col("__n")).otherwise(0L)).as("__R"))
    // delta_b = ln(p_b/q_b) with Laplace smoothing, as ONE ln of a
    // ratio of exact int64 products (≲ 1e13 at sf0.1 — exact in both
    // int64 and double), 6-dp-rounded into DECIMAL
    val deltas = rawCnt.join(tgtCnt, Seq("__b"), "left")
      .na.fill(0L, Seq("__tc"))
      .crossJoin(broadcast(totals))
      .withColumn("__delta", round(log(
        ((col("__tc") + 1) * (col("__R") + numBuckets)).cast("double") /
          ((col("__rc") + 1) * (col("__T") + numBuckets)).cast("double")), 6)
        .cast("decimal(18,6)"))
      .select(col("__b"), col("__delta"))

    // per-doc score: bucket counts × broadcast deltas, one hash agg
    val docBuckets = feats.filter(!col("__tgt"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
    val scored = docBuckets.join(broadcast(deltas), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_feats"),
        sum(col("__c") * col("__delta")).cast("decimal(28,6)").as("__w"))
    val allRaw = toks.filter(!col("__tgt")).select(col(idCol))
    val withAll = allRaw.join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("__w"), lit(0).cast("decimal(28,6)")).as("__w"))

    val nRaw = withAll.count()
    val quota = math.ceil(keepFrac * nRaw).toLong
    Ordinals.withOrderedOrdinal(withAll,
        Seq(col("__w").desc, col(idCol)), "sel_rank")
      .withColumn("weight", col("__w").cast("double") + lit(0.0))
      .withColumn("selected", col("sel_rank") <= quota)
      .select(col(idCol), col("n_feats"), col("weight"),
        col("sel_rank"), col("selected"))
  }
}
