package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextShingles}

/** Benchmark decontamination — flag training documents that overlap an
  * evaluation/benchmark set by shared word n-grams (the standard
  * n-gram-overlap decontamination used for LLM training corpora).
  *
  * Scale shape: the benchmark side is always SMALL (eval suites are
  * thousands of documents, the corpus is the 100 TB side), so its
  * distinct shingle set is broadcast and the corpus is scanned exactly
  * once — shingle explode + broadcast-hash semi-match + one hash
  * aggregation keyed by doc id. The corpus text itself never shuffles;
  * only (id, matched-count) rows move.
  */
object Decontamination {

  /** Per-corpus-document contamination stats against `benchmark`:
    * (id, n_shingles, n_matched, contam_frac, is_contaminated) where
    * shingles are distinct word-k-grams and a doc is contaminated when
    * the matched fraction reaches `threshold`.
    */
  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 3, threshold: Double = 0.5): DataFrame = {
    def shingleSet(c: org.apache.spark.sql.Column) =
      array_distinct(TextShingles.shingles(TextAnalysis.tokens(c), k))
    // blank/short benchmark docs collapse to the whole-text shingle
    // ("" for empty text); drop empties so a vacuous match cannot flag
    // every blank corpus doc as 100% contaminated
    val benchSh = benchmark
      .select(explode(shingleSet(col(textCol))).as("sh"))
      .filter(col("sh") =!= "").distinct()
    // ONE pass over the corpus: explode each doc's shingles, tag the
    // benchmark hits with a broadcast left join, count both totals in
    // the same hash aggregation (the corpus is shingled exactly once)
    corpus.select(col(idCol).as("id"), explode(shingleSet(col(textCol))).as("sh"))
      .join(broadcast(benchSh.withColumn("__hit", lit(1L))), Seq("sh"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("contam_frac",
        round(col("n_matched").cast("double") / col("n_shingles").cast("double"), 6))
      .withColumn("is_contaminated",
        (col("n_matched").cast("double") / col("n_shingles").cast("double")
          >= threshold).cast("long"))
  }

  /** The filtering face: corpus minus contaminated documents. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val bad = contaminationStats(corpus, benchmark, idCol, textCol, k, threshold)
      .filter(col("is_contaminated") === 1L).select(col("id"))
    corpus.join(bad, corpus(idCol) === bad("id"), "left_anti")
  }
}
