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

  /** Window-level duplication rate per group — the sub-document
    * repetition metric doc-level dedup is blind to: template headers,
    * navigation boilerplate, and licence blocks repeat across
    * otherwise-distinct documents, and they surface as token WINDOWS
    * whose hash appears more than once in the corpus. Chunks every
    * document ([[chunkByTokens]], non-overlapping `windowTokens`
    * tiles — stride = window, so each token is counted once), hashes
    * each window, and publishes per group: total windows, windows
    * whose hash repeats corpus-wide, and the duplication rate in
    * exact integer ppm.
    *
    * Scale shape: one chunk scan + one hash census (groupBy over
    * window hashes) + one co-partitioned join back — no pairwise
    * anything; a mega-duplicated window is one census row, not a
    * quadratic bucket.
    *
    * Output: `(groupCol, n_windows, n_dup_windows, dup_ppm)`.
    */
  def windowDupRate(docs: DataFrame, idCol: String, groupCol: String,
                    textCol: String, windowTokens: Int): DataFrame = {
    val chunks = chunkByTokens(docs, idCol, textCol,
        maxTokens = windowTokens, stride = windowTokens)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .select(col(groupCol).as("__grp"), md5(col("chunk_text")).as("__h"))
    val census = chunks.groupBy(col("__h"))
      .agg(count(lit(1)).as("__cnt"))
    chunks.join(census, Seq("__h"))
      .groupBy(col("__grp"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__cnt") > 1L, 1L).otherwise(0L)).as("n_dup_windows"))
      .select(col("__grp").as(groupCol), col("n_windows"),
        col("n_dup_windows"),
        expr("CAST(n_dup_windows * 1000000 DIV n_windows AS BIGINT)")
          .as("dup_ppm"))
      .orderBy(col(groupCol))
  }

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
