package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Context-window document chunking — the step between cleaning and
  * sequence packing in a training-data pipeline: every document is
  * cut into token windows of at most `maxTokens`, with consecutive
  * windows starting `stride` tokens apart (stride < maxTokens ⇒
  * overlapping windows, the usual long-context recipe so no span is
  * seen only at a window edge).
  *
  * Tokens are [[TextAnalysis.tokens]] (lowercased whitespace tokens —
  * the corpus-wide convention every text operator shares, so chunk
  * counts agree with [[SequencePacking]]'s budgets). Window starts are
  * `0, stride, 2·stride, …` while `start < n`; the final window is
  * the (possibly shorter) suffix. Documents with zero tokens emit no
  * chunks.
  *
  * Scale shape: one scan — tokenize, explode the start sequence,
  * slice; everything is codegen'd array arithmetic (`sequence`/
  * `slice`/`array_join`), no UDF, no shuffle at all until the caller
  * aggregates. Output rows are (input rows) × (⌈n/stride⌉ amplification)
  * by construction — the caller sizes stride for the corpus exactly
  * like a tokenizer's context length.
  *
  * Output: `(idCol, chunk_idx (1-based), start_token (0-based),
  * n_tokens, chunk_text)`.
  */
object Chunking {

  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(stride >= 1 && stride <= maxTokens,
      s"stride must be in [1, maxTokens], got $stride")
    val toks = docs.select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
    toks
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("__i", "__start")))
      .select(col(idCol),
        (col("__i") + 1).cast("long").as("chunk_idx"),
        col("__start").cast("long").as("start_token"),
        least(lit(maxTokens).cast("long"), col("__n") - col("__start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(maxTokens)),
          " ").as("chunk_text"))
  }
}
