package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Inverted index (term → posting list) and boolean keyword search —
  * the classic IR structure as a Spark build + probe pair.
  *
  * Build is one explode of each document's DISTINCT terms and one hash
  * aggregation keyed by term: the text itself never shuffles, only
  * (term, doc_id) pairs, and the aggregation is map-side partial. At
  * 100 TB the posting lists of frequent terms are the long pole — the
  * production layout shards a hot term's postings into bounded
  * segments (term, segment_no, ids) under the same groupBy; the
  * search face is unchanged since it re-explodes postings anyway.
  *
  * Search uses ONLY the index: select the query terms' rows, explode
  * their postings, and keep doc_ids hit by ALL terms (count == number
  * of terms — a k-way intersection as one hash aggregation).
  */
object InvertedIndex {

  /** Posting lists: (term, df, postings sorted asc). */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))

  /** Documents containing ALL `terms`, resolved purely from the index.
    * Terms normalize with the build-side tokenizer convention
    * (lowercase + trim) and dedupe — a repeated or differently-cased
    * query term must not make the intersection unsatisfiable.
    */
  def searchAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    val ts = terms.map(_.trim.toLowerCase).distinct
    val n = ts.length
    index.filter(col("term").isin(ts: _*))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === n)
      .select(col("doc_id"))
  }
}
