package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source corpus diagnostics: pairwise vocabulary overlap between
  * document groups (sources, languages, shards) — the mixing-design
  * companion to token-budget source mixing (q90): near-duplicate
  * sources (leeched mirrors, re-crawls) show up as high vocabulary
  * Jaccard before any document-level dedup runs.
  *
  * Shape at scale: the (group, token) vocabulary is ONE distinct hash
  * aggregation over the exploded token stream; the intersection is a
  * self-join co-partitioned on token (a token present in g groups
  * contributes g² rows — bounded by #groups², not corpus size); group
  * sizes are a tiny per-group count whose cross join enumerates all
  * pairs so ZERO-overlap pairs surface too (a left join would drop
  * them). Nothing is collected.
  */
object CorpusOverlap {

  /** (g_a, g_b, vocab_a, vocab_b, common, jaccard) for every unordered
    * group pair with g_a < g_b; jaccard rounded to 6 decimals.
    *
    * Retention: the per-group vocab frame stays persisted after the
    * result is consumed (it feeds three lazily-evaluated branches, so
    * the operator cannot unpersist it itself). It is registered with
    * [[Retained]] — callers release via `Retained.releaseAll(spark)`
    * after their consuming action (Verify/Bench do, per query).
    */
  def vocabularyOverlap(docs: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val vocab = Retained.track(docs
      .select(col(groupCol).as("__g"),
        explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("__w"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = vocab.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val pairs = sizes.select(col("__g").as("g_a"), col("__n").as("vocab_a"))
      .join(sizes.select(col("__g").as("g_b"), col("__n").as("vocab_b")),
        col("g_a") < col("g_b"))
    val inter = vocab.as("a")
      .join(vocab.as("b"),
        col("a.__w") === col("b.__w") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("g_a"), col("b.__g").as("g_b"))
      .agg(count(lit(1)).as("common"))
    pairs.join(inter, Seq("g_a", "g_b"), "left")
      .withColumn("common", coalesce(col("common"), lit(0L)))
      .select(col("g_a"), col("g_b"), col("vocab_a"), col("vocab_b"), col("common"),
        (round(col("common").cast("double") /
          (col("vocab_a") + col("vocab_b") - col("common")).cast("double"), 6) +
          lit(0.0)).as("jaccard"))
  }

  /** SKETCHED pairwise vocabulary overlap — the 100 TB face of
    * [[vocabularyOverlap]]: the exact matrix pays a vocab×vocab
    * self-join whose common-token fan-out grows with the corpus; this
    * face reads the data ONCE into a k-bounded KMV sketch per group
    * (the native `kmv_lows` aggregate: k longs per group per
    * partition on the exchange) and estimates every pair from the
    * sketches alone — O(groups²·k) driver arithmetic, independent of
    * corpus size. Groups are GROUP-like (sources, languages, shards)
    * by the same contract as [[ExactSelection]]'s keyed drill.
    *
    * Estimator (Beyer et al., SIGMOD'07 k-minimum-values set
    * operations): for pair (a, b), take the k lowest of
    * sketch_a ∪ sketch_b; Jaccard ≈ |{h ∈ that set : h in BOTH
    * sketches}| / |that set| — published as exact integer ppm, so an
    * external SQL engine replays the whole estimate bit-for-bit
    * (48-bit md5 token hashes, the corpus-wide q105 convention).
    * When a pair's combined vocabulary has ≤ k distinct hashes the
    * estimate is the exact Jaccard.
    *
    * Output: `(g_a, g_b, union_k, common_k, jaccard_est_ppm)` for
    * every unordered pair with `g_a < g_b` (string-rendered groups),
    * ordered.
    */
  def sketchedVocabularyOverlap(docs: DataFrame, groupCol: String,
                                textCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.KmvLowsAgg.register(spark)
    val hashes = docs.select(col(groupCol).cast("string").as("__g"),
        explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("__w"))
      .filter(col("__g").isNotNull)
      .select(col("__g"),
        conv(substring(md5(col("__w")), 1, 12), 16, 10).cast("long").as("__h"))
    // kmv_lows dedups internally (TreeSet buffer) — no distinct pass;
    // result arrays are ascending. The collect is groups-sized by
    // contract; all pair arithmetic is driver-side on k-long arrays.
    val sketches = hashes.groupBy(col("__g"))
      .agg(expr(s"kmv_lows(__h, $k)").as("__sk"))
      .as[(String, Seq[Long])].collect().sortBy(_._1)
    val rows = for {
      (ga, sa) <- sketches.toSeq
      (gb, sb) <- sketches.toSeq if ga < gb
    } yield {
      val aSet = sa.toSet
      val bSet = sb.toSet
      val u = (aSet ++ bSet).toSeq.sorted.take(k)
      val common = u.count(h => aSet(h) && bSet(h)).toLong
      (ga, gb, u.size.toLong, common, common * 1000000L / u.size)
    }
    rows.toDF("g_a", "g_b", "union_k", "common_k", "jaccard_est_ppm")
      .orderBy(col("g_a"), col("g_b"))
  }
}
