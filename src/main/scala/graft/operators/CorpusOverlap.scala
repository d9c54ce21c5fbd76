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
}
