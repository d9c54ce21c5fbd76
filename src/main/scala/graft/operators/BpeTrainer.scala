package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) merge-rule training — the
  * tokenizer-building step of an LLM data pipeline, shaped the way it
  * scales:
  *
  *  1. the corpus collapses ONCE to a word-frequency table (one hash
  *     aggregation over extracted tokens). Every later pass runs on
  *     that |vocabulary|-sized frame — orders of magnitude smaller than
  *     the corpus, but still distributed (web-scale text has billions
  *     of distinct tokens, so it is never collected);
  *  2. each merge iteration is one narrow map (apply the previous
  *     merge) + one hash aggregation (adjacent-pair counts weighted by
  *     word frequency) + a 1-row TakeOrdered for the arg-max pair. The
  *     only driver-side state is the single winning rule per iteration
  *     — the same k-sized footprint as [[KMeans]] centroid seeds;
  *  3. symbol sequences live in ONE string column with a two-space
  *     separator and single-space sentinels (`" l  o  w "`), so a merge
  *     is a literal, codegen'd `replace(seq, " a  b ", " ab ")`. The
  *     doubled interior separator means adjacent occurrences each keep
  *     a flanking space and left-to-right non-overlapping replacement
  *     reproduces exactly the classic greedy BPE merge order.
  *
  * Tokens are `[a-z]+` runs of the lowercased text (no end-of-word
  * marker — rules merge within tokens only). Arg-max ties break on
  * lexicographically smallest (a, b), making the rule sequence
  * deterministic on any engine and any partitioning.
  */
object BpeTrainer {

  private val outSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("freq", LongType, nullable = false)))

  /** First `merges` BPE merge rules over `textCol`:
    * (rank, a, b, freq), rank 1-based in merge order. Stops early if
    * the corpus runs out of adjacent pairs.
    */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    val wf0 = docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("([a-z]+)"), lit(1))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // " a  b  c ": each char gains one flanking space on both sides
      .select(regexp_replace(col("w"), "(.)", " $1 ").as("seq"), col("cnt"))
      .persist()
    var wf = wf0
    val rules = Seq.newBuilder[Row]
    var exhausted = false
    for (i <- 1 to merges if !exhausted) {
      val best = wf
        .select(split(trim(col("seq")), "  ").as("l"), col("cnt"))
        .filter(size(col("l")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(l)-2), i -> struct(l[i] AS a, l[i+1] AS b))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        rules += Row(i, a, b, best(0).getLong(2))
        // literal merge; the doubled separator keeps the invariant for
        // the next round (replacement re-emits single flanking spaces)
        wf = wf.withColumn("seq",
          call_function("replace", col("seq"),
            lit(s" $a  $b "), lit(s" ${a + b} ")))
      }
    }
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rules.result(), 1), outSchema)
    wf0.unpersist()
    out
  }
}
