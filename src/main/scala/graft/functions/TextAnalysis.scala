package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting (whitespace + BPE-ish regex), quality
  * scoring, language identification (marker-word n-gram heuristic) and
  * document fingerprinting. All pure Column expressions — codegen'd,
  * no UDFs, no shuffles; they run inside the scan stage at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text (empties dropped). */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: letter runs, digit runs, and single
    * punctuation marks each count as one token.
    */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenRe), lit(0)))

  /** ASCII punctuation characters in the raw text. */
  val PunctClass = "[.,;:!?'\"()\\[\\]{}-]"
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, PunctClass, ""))

  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(punctCount(c).cast("double") / length(c).cast("double"))

  /** Small closed stopword list (quality signal, not linguistics). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def stopwordCount(c: Column): Column =
    size(filter(tokens(c), t => t.isInCollection(Stopwords)))

  def stopwordRatio(c: Column): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(c).cast("double") / n.cast("double"))
  }

  /** Composite quality score in [0,1]: length saturation + low punctuation
    * + healthy stopword share. Formula is fixed so the DuckDB oracle can
    * reproduce it bit-for-bit (single FP ops on exact ints).
    */
  def qualityScore(c: Column): Column =
    least(tokenCount(c).cast("double") / lit(100.0), lit(1.0)) * lit(0.5) +
      (lit(1.0) - punctRatio(c)) * lit(0.25) +
      stopwordRatio(c) * lit(0.25)

  /** Marker-word sets per language for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "is", "of", "and", "to", "in", "it"),
    "es" -> Seq("el", "la", "y", "es", "de", "que", "un", "en"),
    "fr" -> Seq("le", "la", "et", "est", "les", "des", "un", "une"))

  def langScore(c: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    size(filter(tokens(c), t => t.isInCollection(markers)))
  }

  /** Predicted language = argmax of marker scores; ties resolve to the
    * alphabetically-first language (deterministic, oracle-replicable).
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(c, l) }
    scores.foldRight(lit("und")) { case ((l, s), rest) =>
      val isMax = scores.filter(_._1 != l).map { case (_, o) => s >= o }.reduce(_ && _)
      when(isMax, lit(l)).otherwise(rest)
    }
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase
    * text.
    */
  def fingerprintMd5(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Winnowing-style fingerprint: the lexicographic minimum of the md5
    * hashes of all word k-gram shingles (rolling-hash document sketch).
    */
  def winnowFingerprint(c: Column, k: Int = 5): Column = {
    val sh = TextShingles.shingles(tokens(c), k)
    array_min(transform(sh, s => md5(s)))
  }

  /** Corpus-statistics quality scoring — the statistical cousin of the
    * heuristic [[qualityScore]]: every token is weighted by its CORPUS
    * frequency, so documents full of tokens nothing else uses (OCR
    * noise, mojibake, boilerplate ids) surface without any language
    * resource. Per document:
    *
    *  - `mean_token_df` — mean corpus occurrence count of its tokens
    *    (low = rare-vocabulary document);
    *  - `rare_frac` — fraction of its tokens occurring ≤ `rareMaxCount`
    *    times corpus-wide (high = garbage indicator).
    *
    * Both are exact integer ratios finished by ONE double division, so
    * any engine reproduces them bit-for-bit (deliberately NOT
    * log-surprisal: a cross-engine float `log` sum is not
    * reproducible). Shape: one token-level aggregation (the vocabulary,
    * map-side combined) + one shuffle join back on token + one per-doc
    * aggregation — every stage keyed and parallel at corpus size.
    */
  def corpusFrequencyStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
                           textCol: String, rareMaxCount: Long = 2L
                          ): org.apache.spark.sql.DataFrame = {
    // both the vocabulary aggregation and the join-back probe read the
    // exploded tokens; checkpoint so tokenize+explode runs ONCE
    val tok = docs.select(col(idCol).as("__id"),
        explode(tokens(col(textCol))).as("__t"))
      .localCheckpoint(true)
    val vocab = tok.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    tok.join(vocab, Seq("__t"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__df")).cast("double") / count(lit(1))).as("mean_token_df"),
        (sum(when(col("__df") <= rareMaxCount, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("rare_frac"))
      .withColumnRenamed("__id", idCol)
  }
}

/** Word k-gram shingling shared by fingerprinting and MinHash dedup. */
object TextShingles {
  /** All consecutive k-grams of `tokens` joined by a single space; for
    * texts shorter than k tokens, the whole text is the one shingle.
    * Evaluated by the native one-pass [[graft.plans.ShinglesExpr]].
    */
  def shingles(tokens: Column, k: Int): Column =
    graft.plans.ShinglesExpr.shingles(tokens, k)

  /** Pure-`functions._` formulation — portable to SQL engines, used to
    * pin the native expression. Do NOT use on a hot path: `slice(tokens,
    * i, k)` inside the `transform` lambda re-evaluates the captured
    * token expression per output element (higher-order functions don't
    * share subexpressions), which is quadratic in the token count.
    */
  def shinglesDeclarative(tokens: Column, k: Int): Column =
    when(size(tokens) <= k, array(concat_ws(" ", tokens)))
      .otherwise(transform(
        sequence(lit(1), size(tokens) - (k - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(k)))))
}
