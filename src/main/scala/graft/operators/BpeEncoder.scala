package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE ENCODING with a trained merge-rule list — the apply side of
  * [[BpeTrainer]]: classic greedy encoding applies each rule, in rank
  * order, to every occurrence; with the trainer's doubled-separator
  * string form (`" l  o  w "`) that is literally a chain of codegen'd
  * `replace` calls, so encoding is declarative — no per-row UDF loop.
  *
  * The scale move is vocabulary-level dedup: the corpus collapses to
  * its DISTINCT word table (hash aggregation), each distinct word is
  * encoded once, and per-document counts come from joining tokens back
  * to that |vocabulary|-sized frame — the same "never re-process the
  * corpus" shape as the persisted LSH index. The rule list itself is
  * k-sized driver state (like k-means seeds), broadcast into the plan
  * as literals.
  */
object BpeEncoder {

  /** The trainer's char-splitting form: `"low"` → `" l  o  w "`. */
  private def charSeq(w: Column): Column = regexp_replace(w, "(.)", " $1 ")

  /** Applies `rules` in rank order as literal separator-preserving
    * replaces — exactly the merge the trainer performed at that rank.
    */
  private def applyRules(seq: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(seq) { case (c, (a, b)) =>
      call_function("replace", c, lit(s" $a  $b "), lit(s" ${a + b} "))
    }

  /** Distinct-word encoding table: `(w, n_sub, subwords)` — each word
    * of the corpus (the trainer's `[a-z]+` runs of lowercased text)
    * encoded once under `rules`, with its subword count and the
    * space-joined subword rendering.
    */
  def encodeVocab(docs: DataFrame, textCol: String,
                  rules: Seq[(String, String)]): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("([a-z]+)"), lit(1))).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .withColumn("__seq", applyRules(charSeq(col("w")), rules))
      .select(col("w"),
        size(split(trim(col("__seq")), "  ")).cast("long").as("n_sub"),
        regexp_replace(trim(col("__seq")), "  ", " ").as("subwords"))

  /** Per-document subword accounting under `rules`:
    * `(idCol, n_words, n_subwords)`. Documents with no `[a-z]+` word
    * produce no row (nothing to encode).
    */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    rules: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("([a-z]+)"), lit(1))).as("w"))
      .filter(length(col("w")) > 0)
    words.join(encodeVocab(docs, textCol, rules).select(col("w"), col("n_sub")),
        Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }
}
