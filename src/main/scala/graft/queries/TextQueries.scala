package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Merge, Ordinals}
import graft.operators.Merge.{DuplicateMode, ImportMode, Key}

/** Text-analysis queries — language ID, quality scores, tokenization/BPE, retrieval (TF-IDF/BM25/RRF), chunking, readability, PII text audit.
  *
  * Split from the monolithic `SparkEntry.scala` in round 11 (it had
  * grown to 9.5k lines); self-typed to [[SparkEntry]] so every query
  * and shared helper keeps resolving unqualified across family files.
  * Contributes [[queriesText]] / [[oracleSqlText]] to the
  * assembled driver contract.
  */
private[graft] trait TextQueries { this: SparkEntry.type =>

  import Tables._

  // ---------------------------------------------------------------- q19
  /** Text quality scoring: token counts (whitespace + BPE-ish), punct
    * ratio, stopword share, composite quality — all codegen'd scan-stage
    * expressions.
    */
  def q19TextStats(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextAnalysis._
    documents(s, d).select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        punctCount(col("text")).cast("long").as("n_punct"),
        stopwordCount(col("text")).cast("long").as("n_stop"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q20
  /** Language ID via marker-word scoring with deterministic argmax. */
  def q20LangId(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextAnalysis
    // tokenize ONCE, score from the materialized token array, and derive
    // the argmax from the score columns (langId over raw text would
    // re-tokenize per comparison — ~20 scans per row)
    val toks = documents(s, d).select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("__toks"))
    def score(lang: String) = {
      val markers = TextAnalysis.LangMarkers.toMap.apply(lang)
      size(filter(col("__toks"), t => t.isInCollection(markers))).cast("long")
    }
    val scored = toks.select(col("doc_id"), score("de").as("s_de"), score("en").as("s_en"),
      score("es").as("s_es"), score("fr").as("s_fr"))
    scored.withColumn("lang_pred",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
          col("s_de") >= col("s_fr"), lit("de"))
        .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_fr"), lit("en"))
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_en") &&
          col("s_es") >= col("s_fr"), lit("es"))
        .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_en") &&
          col("s_fr") >= col("s_es"), lit("fr"))
        .otherwise(lit("und")))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q21
  /** Document fingerprinting: md5 of normalized content + winnowing-style
    * min-hash over word 5-gram shingles.
    */
  def q21Fingerprint(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextAnalysis._
    // md5-per-shingle is CPU-bound; spread the single test-file split
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        fingerprintMd5(col("text")).as("fp_md5"),
        winnowFingerprint(col("text"), 5).as("fp_winnow"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q64
  /** Corpus-wide vocabulary heavy hitters: term frequency + document
    * frequency, top 20 — the vocab-building aggregate of a tokenizer
    * pipeline. Explode + two-level aggregate, map-side combinable.
    */
  def q64Vocab(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(20)

  // ---------------------------------------------------------------- q69
  /** Token-budget sequence packing: documents concatenated in doc_id
    * order and cut into 512-token training sequences; each doc maps to
    * the sequence range its token span overlaps. The global token
    * offsets come from [[operators.Ordinals.withOrderedPrefixSum]] — a
    * distributed sort plus per-partition offsets, never a
    * single-partition window — and all arithmetic is integral.
    */
  def q69SequencePacking(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    operators.SequencePacking.packByBudget(docs, "n_tokens",
        Seq(col("doc_id")), budget = 512L)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("first_seq"), col("last_seq"), col("n_seqs"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q76
  /** Inverted index over the corpus ([[operators.InvertedIndex]]):
    * term → document frequency + sorted posting list (CSV-joined for
    * the oracle compare). One explode + one hash aggregation; the text
    * never shuffles, only (term, doc_id) pairs.
    */
  def q76InvertedIndex(s: SparkSession, d: String): DataFrame =
    operators.InvertedIndex.build(documents(s, d), "doc_id", "text")
      .select(col("term"), col("df"),
        array_join(col("postings"), ",").as("postings_csv"))
      .orderBy(col("term"))

  // ---------------------------------------------------------------- q77
  /** Boolean AND keyword search resolved purely from the inverted
    * index: explode the query terms' postings, keep doc_ids hit by all
    * terms (k-way intersection as one hash aggregation).
    */
  def q77KeywordSearch(s: SparkSession, d: String): DataFrame = {
    val idx = operators.InvertedIndex.build(documents(s, d), "doc_id", "text")
    operators.InvertedIndex.searchAll(idx, Seq("merge", "vector"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q91
  /** Corpus-statistics quality scoring
    * ([[functions.TextAnalysis.corpusFrequencyStats]]): tokens weighted
    * by their corpus document frequency — rare-vocabulary documents
    * surface as low `mean_token_df` / high `rare_frac`. Exact integer
    * ratios with one final double division, so the oracle reproduces
    * them bit-for-bit; one vocabulary aggregation + one keyed join
    * back, all stages parallel at corpus size.
    */
  def q91CorpusQuality(s: SparkSession, d: String): DataFrame =
    functions.TextAnalysis.corpusFrequencyStats(
        documents(s, d), "doc_id", "text", rareMaxCount = 2L)
      .select(col("doc_id"), col("n_tokens"),
        round(col("mean_token_df"), 6).as("mean_token_df"),
        round(col("rare_frac"), 6).as("rare_frac"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q92
  /** FLAGSHIP curation pipeline — the steps a real pretraining-data
    * pass chains, each one an operator verified on its own elsewhere:
    * (1) heuristic quality gate ([[functions.TextAnalysis.qualityScore]]
    * ≥ 0.45); (2) exact-duplicate collapse to the lowest-id
    * representative ([[operators.TextDedup.exactDedup]] over the
    * whitespace-normalized md5 fingerprint); (3) benchmark
    * decontamination drop ([[operators.Decontamination]], word-3-gram
    * overlap ≥ 0.5 against the doc_id%97 benchmark set). Every stage is
    * a scan-stage filter, a hash aggregation, or a broadcast join — the
    * corpus is never shuffled whole. Survivors emit with their token
    * count and quality score.
    */
  def q92CurationPipeline(s: SparkSession, d: String): DataFrame = {
    val corpus = dedupCorpus(s, d)
    val scored = corpus
      .withColumn("quality", functions.TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= 0.45)
    val reps = operators.TextDedup.exactDedup(scored, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = scored.join(reps, Seq("doc_id"))
    val bench = documents(s, d).filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    val clean = operators.Decontamination.contaminationStats(
        deduped, bench, "doc_id", "text", k = 3, threshold = 0.5)
      .filter(col("is_contaminated") === 0)
      .select(col("id").as("doc_id"))
    deduped.join(clean, Seq("doc_id"))
      .select(col("doc_id"),
        functions.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(col("quality"), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q93
  /** Line-level boilerplate removal ([[operators.LineDedup]]): every
    * document is framed with synthetic site chrome (newsletter header
    * on all, a cookie notice on every third, a two-line copyright
    * footer), and any trimmed line occurring in more than 50 documents
    * corpus-wide is dropped — the C4-style cleaning pass. Output pins
    * the reassembled text by md5 so line order is verified too.
    */
  def q93LineBoilerplate(s: SparkSession, d: String): DataFrame = {
    val pages = documents(s, d).select(col("doc_id"),
      concat(lit("Subscribe to our newsletter\n"),
        when(col("doc_id") % 3 === 0, lit("Cookie notice: we use cookies\n"))
          .otherwise(lit("")),
        col("text"),
        lit("\n(c) 2026 Example Corp\nAll rights reserved")).as("page"))
    operators.LineDedup.removeBoilerplate(pages, "doc_id", "page", maxDf = 50L)
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
        col("n_lines_kept"), col("n_lines_dropped"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q95
  /** Gopher-style repetition quality signals
    * ([[functions.TextAnalysis]]): duplicate-line fraction plus
    * top-/duplicate-bigram fractions, all pure scan-stage Column
    * expressions (the bigram mode is a linear `aggregate` fold over the
    * sorted bigram array — no per-doc shuffle, no quadratic rescan).
    * Complements q60, which profiles bigrams via explode + two-level
    * aggregation (a shuffle-keyed shape): the fold here computes the
    * SAME mode count without leaving the scan stage, so the two queries
    * cross-check each other in-engine; q95 additionally contributes the
    * line-duplication and duplicate-bigram signals q60 lacks. The
    * fixture injects a repeated boilerplate line into every 4th page so
    * the line signal separates. Exact integer ratios, one double
    * division — bit-reproducible in the oracle.
    */
  def q95Repetition(s: SparkSession, d: String): DataFrame = {
    val ta = functions.TextAnalysis
    val pages = documents(s, d).select(col("doc_id"),
      concat(col("text"), lit("\nvisit example dot com\n"),
        when(col("doc_id") % 4 === 0,
          lit("visit example dot com\nvisit example dot com\n")).otherwise(lit("")),
        lit("end of page")).as("page"))
    pages.select(col("doc_id"),
        size(ta.textLines(col("page"))).cast("long").as("n_lines"),
        round(ta.duplicateLineFrac(col("page")), 6).as("dup_line_frac"),
        ta.topBigramCount(col("page")).as("top_bigram_count"),
        round(ta.topBigramFrac(col("page")), 6).as("top_bigram_frac"),
        round(ta.duplicateBigramFrac(col("page")), 6).as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q96
  /** PII detection + redaction ([[functions.TextAnalysis.redactPii]]):
    * emails, IPv4 addresses and international phone numbers counted and
    * replaced with typed placeholders — the standard pre-training
    * redaction pass, all portable-regex scan-stage work. The fixture
    * plants deterministic PII in a third/fifth/seventh of the pages;
    * the redacted text is pinned by md5 so placement is verified, not
    * just counts.
    */
  def q96PiiRedact(s: SparkSession, d: String): DataFrame = {
    val ta = functions.TextAnalysis
    val pages = documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 200).cast("string"),
            lit(".7"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call +49151234"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"))).otherwise(lit("")))
        .as("page"))
    pages.select(col("doc_id"),
        ta.piiCount(col("page"), ta.EmailRe).cast("long").as("n_emails"),
        ta.piiCount(col("page"), ta.Ipv4Re).cast("long").as("n_ips"),
        ta.piiCount(col("page"), ta.PhoneRe).cast("long").as("n_phones"),
        md5(ta.redactPii(col("page"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q98
  /** Distributed BPE merge-rule training (tokenizer building). The
    * corpus collapses ONCE to a word-frequency table; each of the 8
    * merge rounds is one narrow map + one hash aggregation + a 1-row
    * TakeOrdered, so the corpus itself is read a single time and
    * driver-side state is one rule per round ([[operators.BpeTrainer]]).
    * Rule order is engine-independent: integer frequencies, ties on
    * lexicographically smallest (a, b).
    */
  def q98BpeMerges(s: SparkSession, d: String): DataFrame =
    operators.BpeTrainer.train(documents(s, d), "text", merges = 8)
      .orderBy(col("rank"))

  // ---------------------------------------------------------------- q100
  /** Bigram LM quality scoring (Laplace-smoothed, self-trained on the
    * corpus): the statistical quality filter next to the heuristic
    * signals. Count/context tables are hash aggs; scoring is two
    * co-partitioned joins + one per-doc hash agg; each bigram's
    * log-prob is 6-dp-rounded and summed in DECIMAL so the totals are
    * engine-independent ([[operators.NgramLm]]).
    */
  def q100NgramLm(s: SparkSession, d: String): DataFrame =
    operators.NgramLm.scoreByBigramLm(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q106
  /** Per-document token Shannon entropy — the information-theoretic
    * gibberish/boilerplate signal (a doc that repeats one token has
    * H = 0; uniformly varied text approaches ln of its vocabulary).
    * Published as the exact pieces, not the ratio: `sum_clogp` is
    * `Σ_w c_w · round(ln(c_w/n), 6)` summed in DECIMAL (H = −sum/n),
    * because a DECIMAL total casts to double losslessly while the
    * average lands on rounding boundaries. Two hash aggregations,
    * everything else scan-stage.
    */
  def q106TokenEntropy(s: SparkSession, d: String): DataFrame =
    operators.TextStats.tokenEntropy(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q107
  /** Corpus-level PMI collocation discovery: adjacent bigrams scored by
    * `ln(p12 / (p1·p2))` against the unigram distribution — the
    * classic phrase-mining signal (high PMI = the pair co-occurs far
    * above chance). Unigram/bigram counts are hash aggregations with
    * map-side partials; the totals broadcast as 1-row frames; the
    * top-50 is a TakeOrdered, never a global window. A min-count floor
    * of 5 drops the unstable low-frequency tail, and the rounded-PMI /
    * lexicographic order is total so the cut is deterministic.
    */
  def q107PmiCollocations(s: SparkSession, d: String): DataFrame =
    operators.TextStats.pmiCollocations(documents(s, d), "text",
      minCount = 5, k = 50)

  // ---------------------------------------------------------------- q110
  /** BPE encode under the corpus's own trained merges (the apply side
    * of q98): 8 rules trained distributed, then every DISTINCT word
    * encoded once by a chain of codegen'd separator-preserving
    * replaces, joined back to tokens for per-doc subword accounting
    * ([[operators.BpeEncoder]]). The corpus text is processed exactly
    * once (token explode); all per-rule work happens on the
    * vocabulary-sized frame. The oracle replays training AND encoding
    * unrolled in SQL.
    */
  def q110BpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val rules = operators.BpeTrainer.train(docs, "text", merges = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    operators.BpeEncoder.subwordCounts(docs, "doc_id", "text", rules)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q317
  /** q110's BPE encode served from a PERSISTED merge list (fourth
    * artifact class): the 8 trained merge rules — the part that scans
    * the corpus once per rule round — load from
    * [[graft.index.IndexStore]]; encoding then touches only the
    * vocabulary-sized distinct-word frame plus one token pass. Oracle
    * replays the full training + encode chain: hash match = load ≡
    * retrain for the BPE artifact class.
    */
  def q317BpeIndexReuse(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val trained = index.IndexStore.getOrTrain(s, "bpe_merges_documents",
        "r13-1", index.IndexStore.inputKey(d), Map("merges" -> "8")) {
      operators.BpeTrainer.train(docs, "text", merges = 8)
    }
    val rules = trained.orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    operators.BpeEncoder.subwordCounts(docs, "doc_id", "text", rules)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q121
  /** BM25-ranked keyword retrieval over the documents table
    * ([[operators.InvertedIndex.bm25TopK]]) — the scored companion to
    * q77's boolean search. Per-term scores are 6dp-rounded and summed
    * in DECIMAL, so the (score desc, doc_id) top-20 is total and
    * engine-exact.
    */
  def q121Bm25(s: SparkSession, d: String): DataFrame =
    // single test file → one input split; spread the CPU-bound
    // tokenize (real corpora get this from file splits)
    operators.InvertedIndex.bm25TopK(
        documents(s, d).repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text", Seq("merge", "vector", "stream"), k = 20)
      .select(col("doc_id"), col("n_terms_hit"), col("score"))

  // ---------------------------------------------------------------- q127
  /** Hybrid-retrieval fusion: BM25 lexical ranking (q121's scorer) and
    * brute-force cosine ANN ranking (q26's) combined by reciprocal
    * rank fusion, `Σ 1/(60+rank)` (Cormack et al., SIGIR'09) — the
    * standard first stage of a RAG retrieval stack. Fusion consumes
    * only the two k-sized rank lists (a full-outer join of 50-row
    * frames), so the corpus cost is exactly the two retrievers'; the
    * rank-only formula needs no score calibration between the lexical
    * and vector spaces and is engine-exact (integer ranks, one IEEE
    * division each). Absent ranks surface as 0, not NULL.
    */
  def q127Rrf(s: SparkSession, d: String): DataFrame = {
    val bm = operators.InvertedIndex.bm25TopK(
        documents(s, d).filter(col("doc_id") >= 10)
          .repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text", Seq("merge", "vector", "stream"), k = 50)
      // 50-row frame post-limit: the unpartitioned window is bounded
      .withColumn("rb", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rb"))
    val q0 = embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val ann = operators.Similarity.bruteForceTopK(q0,
        embeddings(s, d).filter(col("vec_id") >= 10), k = 50)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("ra"))
    bm.join(ann, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60.0) + col("rb").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("ra").cast("double")), lit(0.0)), 9))
      .select(col("doc_id"), coalesce(col("rb"), lit(0L)).as("bm25_rank"),
        coalesce(col("ra"), lit(0L)).as("ann_rank"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q132
  /** Retrieval-quality evaluation of the IVF ANN index against the
    * exact-cosine ground truth: per query, recall@10, MRR, and nDCG@10
    * with binary relevance — the eval harness every vector-index
    * deployment runs before trading exactness for speed. All
    * discount terms are `round(1/log2(rank+1), 6)` summed in DECIMAL
    * (the one libm call rounded, q100 discipline); ranks are exact
    * integers from both retrievers' total orderings. IDCG comes from
    * the truth list through the SAME rounded formula, so the ratio is
    * engine-exact.
    */
  def q132RetrievalEval(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val corpus = e.filter(col("vec_id") >= 10)
    val truth = operators.Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select(col("query_id"), col("rank").as("t_rank"),
        col("neighbor_id"))
    val sys = operators.Similarity.ivfTopK(queries, corpus, k = 10, nprobe = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val disc = round(lit(1.0) / log2(col("rank").cast("double") + 1.0), 6)
      .cast("decimal(18,6)")
    val judged = sys.join(truth.withColumn("rel", lit(1L))
        .select(col("query_id"), col("neighbor_id"), col("rel")),
        Seq("query_id", "neighbor_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perQuery = judged.groupBy(col("query_id"))
      .agg(sum(col("rel")).as("n_hits"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"),
        sum(when(col("rel") === 1L, disc).otherwise(lit(0.0).cast("decimal(18,6)")))
          .as("dcg"))
    val idcg = truth
      .withColumn("dt", round(lit(1.0) / log2(col("t_rank").cast("double") + 1.0), 6)
        .cast("decimal(18,6)"))
      .groupBy(col("query_id")).agg(sum(col("dt")).as("idcg"))
    perQuery.join(idcg, "query_id")
      .select(col("query_id"), col("n_hits"),
        round(col("n_hits").cast("double") / 10.0, 6).as("recall_at_10"),
        coalesce(round(lit(1.0) / col("first_rel").cast("double"), 6), lit(0.0))
          .as("mrr"),
        round(col("dcg").cast("double") / col("idcg").cast("double"), 6)
          .as("ndcg_at_10"))
      .orderBy(col("query_id"))
  }

  // ---------------------------------------------------------------- q147
  /** Distinctive vocabulary per language ([[operators.Keyness
    * .topDistinctive]]): Monroe et al. smoothed log-odds z-scores of
    * each term in one lang's documents vs the rest of the corpus, top
    * 8 per lang. One (lang, term) hash agg + vocabulary-sized joins;
    * doubles are confined to one codegen'd projection and rounded to
    * 6 dp before ranking, so both engines rank identically.
    */
  def q147Keyness(s: SparkSession, d: String): DataFrame =
    operators.Keyness.topDistinctive(
        documents(s, d).withColumn("toks",
          functions.TextAnalysis.tokens(col("text"))),
        "lang", "toks", k = 8)
      .select(col("grp").as("lang"), col("rank"), col("term"),
        col("y_g"), col("y_rest"), col("z"))
      .orderBy(col("lang"), col("rank"))

  // ---------------------------------------------------------------- q162
  /** Flesch reading-ease scoring ([[functions.TextAnalysis
    * .fleschReadingEase]]): the classic readability quality signal
    * over exact integer word/sentence/syllable-heuristic counts —
    * pure scan-stage Column expressions (regexp runs + one clamped
    * fold), no shuffle beyond the final sort. One fixed FP formula
    * per doc, rounded 6 dp.
    */
  def q162Readability(s: SparkSession, d: String): DataFrame = {
    val ta = functions.TextAnalysis
    documents(s, d)
      .select(col("doc_id"),
        ta.tokenCount(col("text")).cast("long").as("n_words"),
        ta.syllableCount(col("text")).cast("long").as("n_syllables"),
        ta.sentenceCount(col("text")).cast("long").as("n_sentences"),
        round(ta.fleschReadingEase(col("text")), 6).as("reading_ease"))
      .filter(col("n_words") > 0)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q164
  /** Sliding-window document chunking for retrieval/RAG pipelines
    * ([[functions.TextAnalysis.tokens]] + `sequence`/`slice`): 40-token
    * chunks at stride 30 (10-token overlap). Pure scan-stage
    * expressions — the chunk grid is `sequence(0, n−1, stride)` and
    * each chunk one 1-based `slice`; chunk_idx = start DIV stride is
    * exact integer arithmetic shared with the oracle. No shuffle
    * beyond the output sort; at 100 TB chunking is embarrassingly
    * parallel scan work.
    */
  def q164Chunking(s: SparkSession, d: String): DataFrame = {
    val size40 = 40; val stride = 30
    documents(s, d)
      .withColumn("toks", functions.TextAnalysis.tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("start",
        explode(sequence(lit(0), col("n") - 1, lit(stride))))
      .select(col("doc_id"),
        expr(s"start DIV $stride").as("chunk_idx"),
        size(slice(col("toks"), col("start") + 1, lit(size40)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(size40)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // ---------------------------------------------------------------- q56
  /** Corpus text normalization (NFC + control-char strip + whitespace
    * collapse) as a native single-pass expression
    * ([[graft.plans.TextNormalizeExpr]]) — scan-stage work, no shuffle.
    * The fixture prepends a DECOMPOSED accent (e + U+0301), a tab and
    * doubled spaces, and appends an NBSP (which must survive — it's
    * data, not damage) so the pass is exercised for real.
    */
  def q56Normalize(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("messy",
        concat(lit("é\t "), col("text"), lit("  x y")))
      .select(col("doc_id"),
        graft.plans.TextNormalizeExpr.textNormalize(col("messy")).as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q57
  /** PII masking (emails, phone numbers → placeholder tokens) — pure
    * scan-stage regexp work on a synthesized contact string; patterns
    * stay RE2-safe (plain character classes, no lookaround) so the same
    * regex runs on any engine.
    */
  def q57PiiMask(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .withColumn("contact",
        concat(regexp_replace(lower(col("c_name")), " ", "."),
          lit("@corp"), col("c_nationkey"), lit(".example.com call 555-"),
          col("c_custkey"), lit(" or (41) 555-0199")))
      .select(col("c_custkey"),
        regexp_replace(
          regexp_replace(col("contact"), "[a-z0-9.#]+@[a-z0-9.-]+", "[EMAIL]"),
          "[0-9]{3}-[0-9]+", "[PHONE]").as("contact_masked"))
      .orderBy(col("c_custkey"))

  // ---------------------------------------------------------------- q58
  /** Deterministic train/val/test split by content-independent key hash
    * (md5 of the id, first 8 hex digits) — the reproducible alternative
    * to rand()-based sampling: any engine, any run, any partitioning
    * produces the SAME assignment, and the split survives re-ingestion.
    */
  def q58HashSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("h") < 80, lit("train"))
          .when(col("h") < 90, lit("val")).otherwise(lit("test")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))

  // ---------------------------------------------------------------- q59
  /** Sliding-window token chunking (window 32, stride 24) — how long
    * documents become training samples. explode(sequence) keeps it a
    * scan-stage generator: no shuffle, output size ~ n/stride per doc.
    */
  def q59Chunking(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", graft.functions.TextAnalysis.tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .withColumn("last_idx",
        when(col("n") <= 32, lit(0)).otherwise(expr("(n - 32 + 23) DIV 24")))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("last_idx"))))
      .withColumn("chunk_toks", expr("slice(toks, chunk_idx * 24 + 1, 32)"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk_toks"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ---------------------------------------------------------------- q60
  /** Gopher-style repetition/quality signals per document: distinct-token
    * fraction, mean word length, and top-bigram fraction. The bigram
    * frequency profile needs one explode + two-level aggregate; all
    * ratios are single integer divisions (bit-identical across engines).
    */
  def q60RepetitionQuality(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .withColumn("toks", graft.functions.TextAnalysis.tokens(col("text")))
      .withColumn("n", size(col("toks")))
    val stats = base.select(col("doc_id"), col("n"),
      (size(array_distinct(col("toks"))).cast("double") /
        col("n").cast("double")).as("distinct_frac"),
      (expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").cast("double") /
        col("n").cast("double")).as("mean_word_len"))
    val bigrams = base
      .withColumn("bg", explode(expr(
        "transform(sequence(1, n - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_bigram_frac"))
    stats.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        col("distinct_frac"), col("mean_word_len"), col("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q47
  /** Per-document top term by TF-IDF-style relevance. The score is the
    * RATIONAL form `tf · N / df` (one IEEE double division of exact
    * integers) rather than `tf · ln(N/df)` — transcendental libm results
    * are not bit-identical across engines, the rational form is, and the
    * ranking it induces is the same for fixed N. Ties break on the
    * lexicographically smallest term.
    */
  def q47Tfidf(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextAnalysis
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q180
  /** Keyword-in-context (KWIC) concordance: every occurrence of the
    * probe terms with ±3 tokens of context — the corpus-inspection
    * primitive behind "show me how this token is actually used"
    * (quality triage, sense disambiguation). Pure scan-stage token
    * arithmetic: posexplode + slice, no join, no window.
    */
  def q180Kwic(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("merge", "vector", "window")
    val t = documents(s, d).select(col("doc_id"),
      functions.TextAnalysis.tokens(col("text")).as("toks"))
    t.select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("p0", "term")))
      .filter(col("term").isin(terms: _*))
      .withColumn("pos", col("p0") + 1) // 1-based like the SQL slice
      .withColumn("__s", greatest(lit(1), col("pos") - 3))
      .withColumn("__e", least(col("pos") + 3, size(col("toks"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term"),
        concat_ws(" ", slice(col("toks"), col("__s"),
          col("__e") - col("__s") + 1)).as("context"))
      .orderBy(col("doc_id"), col("pos"))
  }

  // ---------------------------------------------------------------- q192
  /** Sequence-length bucketing audit: docs assigned to power-of-two
    * token buckets, padding waste per bucket in exact ppm — the
    * batch-packing efficiency readout that sizes a training run's
    * bucket boundaries (complements q69's offset packing). Pure
    * scan-stage CASE; one hash agg.
    */
  def q192LengthBuckets(s: SparkSession, d: String): DataFrame = {
    val n = size(functions.TextAnalysis.tokens(col("text")))
    val bucket = when(n <= 16, 16).when(n <= 32, 32).when(n <= 64, 64)
      .when(n <= 128, 128).when(n <= 256, 256).when(n <= 512, 512)
      .otherwise(1024)
    documents(s, d)
      .select(col("doc_id"), n.cast("long").as("n_tok"),
        bucket.cast("long").as("bucket"))
      .filter(col("n_tok") <= 1024) // over-cap docs would TRUNCATE, not pad
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("bucket") - col("n_tok")).as("n_padding"))
      .withColumn("waste_ppm",
        expr("(n_padding * 1000000) DIV (bucket * n_docs)"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------- q199
  /** Out-of-vocabulary rate per source against the global top-1000
    * vocabulary — the cheap domain-shift screen (a source whose token
    * mass falls outside the corpus head is jargon, another language,
    * or garbage). Vocabulary = one hash agg + TakeOrdered; rates are
    * exact ppm integers.
    */
  def q199OovRate(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(col("source"),
      explode(functions.TextAnalysis.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(1000)
      .select(col("tok"), lit(1).as("iv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("(n_oov * 1000000) DIV n_tokens"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q200
  /** One-row corpus datacard: the summary block a dataset release
    * ships with — sizes, language/source spread, token budget,
    * near-dup involvement — every figure an exact integer, composed
    * from the shared pair artifact plus two scans.
    */
  def q200Datacard(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(functions.TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("n_tokens"),
      count_distinct(col("lang")).as("n_langs"),
      count_distinct(col("source")).as("n_sources"))
    val dup = dedupPairs(s, d).select(col("id1").as("id"))
      .unionAll(dedupPairs(s, d).select(col("id2").as("id")))
      .select(pmod(col("id"), lit(1000000L)).as("doc_id")).distinct()
      .agg(count(lit(1)).as("n_dup_docs"))
    base.crossJoin(broadcast(dup))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"), col("n_dup_docs"),
        expr("(n_dup_docs * 1000000) DIV n_docs").as("dup_ppm"),
        expr("(n_tokens * 1000) DIV n_docs").as("mean_tokens_permille"))
  }

  // ---------------------------------------------------------------- q208
  /** PII masking + format audit over customer ([[functions.PiiMask]]):
    * phones masked to `**-***-***-1234` (digits starred, last 4 kept),
    * anchored format validation, email-shaped-substring counts in the
    * comment. The GDPR-export transform a curation pipeline applies
    * before handing a table downstream; every expression is RE2-safe
    * (no lookarounds) so the DuckDB oracle replays it bit-for-bit.
    */
  def q208PiiMask(s: SparkSession, d: String): DataFrame = {
    // the synthetic customer table carries no phone/comment — derive
    // deterministic fixtures (every 10th phone corrupted so BOTH
    // validity outcomes occur; 0/1/2 planted emails by custkey mod 3)
    // with engine-portable scalar SQL the oracle replays verbatim;
    // the operator under test is the PiiMask expression set
    val ph = concat(
      lpad(col("c_nationkey").cast("string"), 2, "0"), lit("-"),
      lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0"))
    val phone = when(col("c_custkey") % 10 === 0, concat(ph, lit("x")))
      .otherwise(ph)
    val ck = col("c_custkey").cast("string")
    val comment = when(col("c_custkey") % 3 === 0,
        concat(lit("reach u"), ck, lit("@example.com or x"),
          ck, lit("@test.org")))
      .when(col("c_custkey") % 3 === 1, lit("no contact info"))
      .otherwise(concat(lit("mail: a"), ck, lit("@mail.net")))
    customer(s, d).filter(col("c_custkey") <= 1000)
      .select(col("c_custkey"), phone.as("__ph"), comment.as("__cm"))
      .select(col("c_custkey"),
        functions.PiiMask.maskDigitsKeepLast(col("__ph"), 4)
          .as("masked_phone"),
        functions.PiiMask.phoneFormatValid(col("__ph")).as("phone_valid"),
        functions.PiiMask.emailCount(col("__cm")).cast("long")
          .as("n_emails"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q209
  /** Within-document trigram repetition
    * ([[operators.TextStats.trigramRepetition]]) — the redundancy
    * signal quality filters cut on: looping generations and template
    * spam repeat word-trigrams, natural prose mostly does not.
    */
  def q209TrigramRepetition(s: SparkSession, d: String): DataFrame =
    operators.TextStats.trigramRepetition(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q217
  /** Corpus-order novelty curve
    * ([[operators.TextStats.firstSeenNovelty]]): per document, the
    * exact count and ppm of its distinct trigrams appearing for the
    * first time in id order — the diminishing-returns signal of
    * adding more same-source data, and the aggregate dual of dedup.
    */
  def q217Novelty(s: SparkSession, d: String): DataFrame =
    operators.TextStats.firstSeenNovelty(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q233
  /** Per-source Jensen–Shannon divergence from the corpus token mix
    * ([[operators.TextStats.jsDivergence]]): the bounded symmetric
    * drift score (0 = same mix, ln 2 ≈ 0.693 = disjoint vocabulary)
    * that ranks which sources pull the training distribution hardest —
    * the distribution-level complement of PSI (q133, needs bins) and
    * keyness (q147, per-word). Absent-token mass is folded in closed
    * form, so only each source's own vocabulary is ever joined.
    */
  def q233JsDivergence(s: SparkSession, d: String): DataFrame =
    operators.TextStats.jsDivergence(documents(s, d), "source", "text")
      .orderBy(col("source"))

  // ---------------------------------------------------------------- q242
  /** Quality/length Pareto frontier of the corpus
    * ([[operators.Skyline.pareto2d]]): the documents for which no
    * other document is simultaneously higher-quality AND shorter —
    * the skyline a token-budget curator selects from first (every
    * off-frontier doc has a strictly better substitute). The operator
    * reduces per quality level then prefix-min-sweeps the bounded
    * level frame; the oracle replays the textbook quadratic
    * NOT-EXISTS dominance check, pinning the O(n log n) plan against
    * the O(n²) definition.
    */
  def q242QualitySkyline(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"),
      functions.TextAnalysis.qualityScore(col("text")).as("q"))
    operators.Skyline.pareto2d(docs, "q", "n_tokens")
      .select(col("doc_id"), col("n_tokens"),
        round(col("q"), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q255
  /** Water-filling token-budget allocation
    * ([[operators.Sampling.waterFillAllocation]]): cap each source at
    * the unique level c* that makes the corpus fit 60 % of its own
    * token mass — dominant crawls are truncated, small sources keep
    * everything, and `Σ alloc ≤ B` exactly. Where q71/q90's quota
    * mixes need weights chosen up front, the water level is derived
    * FROM the data — the fair-mixing answer a curation run actually
    * wants. One hash agg over the docs; the cap solve runs on the
    * |sources|-sized frame; all-integer arithmetic.
    */
  def q255WaterFilling(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("source"),
      functions.TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
    // ONE corpus scan: per-source totals persist, the budget scalar
    // and the cap solve both read the |sources|-sized frame (the
    // operator's re-aggregation over it is the identity)
    val per = operators.Retained.track(docs.groupBy(col("source"))
      .agg(sum(col("tok")).as("tok")).persist())
    val total = per.agg(coalesce(sum(col("tok")), lit(0L)))
      .collect()(0).getLong(0)
    operators.Sampling.waterFillAllocation(per, "source", "tok",
        budget = total * 3 / 5)
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q285
  /** Context-window chunking ([[operators.Chunking.chunkByTokens]],
    * 32-token windows, stride 24): every document cut into overlapping
    * token windows — the step between cleaning and sequence packing
    * (q245 family) in a training pipeline, sized so the 10–99-token
    * corpus yields 1–5 chunks per doc at every SF. One scan of
    * codegen'd array arithmetic (sequence/slice/array_join): no UDF,
    * no shuffle; row amplification is the explicit ⌈n/stride⌉
    * contract.
    */
  def q285ChunkWindows(s: SparkSession, d: String): DataFrame =
    operators.Chunking.chunkByTokens(
        documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", maxTokens = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ---------------------------------------------------------------- q287
  /** Window-level duplication rate per source
    * ([[operators.Chunking.windowDupRate]], 16-token tiles): the
    * sub-document repetition metric doc-level dedup is blind to —
    * template headers and boilerplate repeat as identical token
    * windows across otherwise-distinct documents. One chunk scan, one
    * corpus-wide hash census, one co-partitioned join back; published
    * as exact integer ppm per source. (At sf0.01 the synthetic corpus
    * already carries a 3–14% natural window-dup rate per source.)
    */
  def q287WindowDupRate(s: SparkSession, d: String): DataFrame =
    operators.Chunking.windowDupRate(
      documents(s, d).select(col("doc_id"), col("source"), col("text")),
      "doc_id", "source", "text", windowTokens = 16)

  private[graft] def queriesText: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q287_window_dup_rate" -> (q287WindowDupRate _),
    "q285_chunk_windows" -> (q285ChunkWindows _),
    "q255_water_filling" -> (q255WaterFilling _),
    "q242_quality_skyline" -> (q242QualitySkyline _),
    "q233_js_divergence" -> (q233JsDivergence _),
    "q19_text_stats" -> (q19TextStats _),
    "q20_lang_id" -> (q20LangId _),
    "q21_fingerprint" -> (q21Fingerprint _),
    "q47_tfidf" -> (q47Tfidf _),
    "q56_normalize" -> (q56Normalize _),
    "q57_pii_mask" -> (q57PiiMask _),
    "q58_hash_split" -> (q58HashSplit _),
    "q59_chunking" -> (q59Chunking _),
    "q60_repetition_quality" -> (q60RepetitionQuality _),
    "q64_vocab" -> (q64Vocab _),
    "q69_sequence_packing" -> (q69SequencePacking _),
    "q76_inverted_index" -> (q76InvertedIndex _),
    "q77_keyword_search" -> (q77KeywordSearch _),
    "q91_corpus_quality" -> (q91CorpusQuality _),
    "q92_curation_pipeline" -> (q92CurationPipeline _),
    "q93_line_boilerplate" -> (q93LineBoilerplate _),
    "q95_repetition" -> (q95Repetition _),
    "q96_pii_redact" -> (q96PiiRedact _),
    "q98_bpe_merges" -> (q98BpeMerges _),
    "q100_ngram_lm" -> (q100NgramLm _),
    "q106_token_entropy" -> (q106TokenEntropy _),
    "q107_pmi_collocations" -> (q107PmiCollocations _),
    "q110_bpe_encode" -> (q110BpeEncode _),
    "q317_bpe_index_reuse" -> (q317BpeIndexReuse _),
    "q121_bm25" -> (q121Bm25 _),
    "q127_rrf" -> (q127Rrf _),
    "q132_retrieval_eval" -> (q132RetrievalEval _),
    "q147_keyness" -> (q147Keyness _),
    "q162_readability" -> (q162Readability _),
    "q164_chunking" -> (q164Chunking _),
    "q180_kwic" -> (q180Kwic _),
    "q192_length_buckets" -> (q192LengthBuckets _),
    "q199_oov_rate" -> (q199OovRate _),
    "q200_datacard" -> (q200Datacard _),
    "q208_pii_mask" -> (q208PiiMask _),
    "q209_trigram_repetition" -> (q209TrigramRepetition _),
    "q217_novelty" -> (q217Novelty _))

  /** The q110 BPE replay (q98's 8 training rounds + the encode chain
    * unrolled: each venc stage applies rule b_n to the distinct-word
    * table exactly as BpeEncoder's replace chain does) — shared
    * verbatim by q317, whose Spark side LOADS the trained merge list
    * from [[graft.index.IndexStore]] instead of retraining: identical
    * hash against this full-retrain replay IS the load ≡ retrain
    * proof for the BPE artifact class. */
  private def bpeEncodeSql: String = {
    val stages = (0 until 8).map { n =>
      s"""p$n AS (
         |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS freq
         |  FROM (SELECT l, cnt, unnest(generate_series(1, len(l)-1)) AS i
         |        FROM (SELECT string_split(trim(seq), '  ') AS l, cnt FROM wf$n))
         |  GROUP BY 1, 2),
         |b$n AS (SELECT a, b FROM p$n ORDER BY freq DESC, a, b LIMIT 1),
         |wf${n + 1} AS (
         |  SELECT replace(seq, ' ' || a || '  ' || b || ' ',
         |                 ' ' || a || b || ' ') AS seq, cnt
         |  FROM wf$n, b$n)""".stripMargin
    }.mkString(",\n")
    val encStages = (0 until 8).map { n =>
      s"""venc${n + 1} AS (
         |  SELECT w, replace(seq, ' ' || a || '  ' || b || ' ',
         |                    ' ' || a || b || ' ') AS seq
         |  FROM venc$n, b$n)""".stripMargin
    }.mkString(",\n")
    s"""WITH dwords AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |wf0 AS (
       |  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS seq, count(*) AS cnt
       |  FROM dwords WHERE w <> '' GROUP BY 1),
       |$stages,
       |venc0 AS (
       |  SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS seq
       |  FROM (SELECT DISTINCT w FROM dwords WHERE w <> '')),
       |$encStages,
       |vn AS (SELECT w,
       |  CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_sub
       |  FROM venc8)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(vn.n_sub) AS BIGINT) AS n_subwords
       |FROM dwords JOIN vn ON vn.w = dwords.w
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private[graft] def oracleSqlText: Map[String, String] = Map(
    "q287_window_dup_rate" ->
      // q285's chunk replay at stride = window (non-overlapping
      // tiles), hashed, censused corpus-wide, dup windows counted per
      // source; exact integer ppm
      s"""WITH tok AS (SELECT doc_id, source, $SqlToks AS toks
         |  FROM documents),
         |t AS (SELECT doc_id, source, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM tok WHERE len(toks) > 0),
         |st AS (SELECT doc_id, source, toks, n,
         |    unnest(generate_series(0, n - 1, 16)) AS s
         |  FROM t),
         |w AS (SELECT source,
         |    md5(array_to_string(list_slice(toks, s + 1, s + 16), ' '))
         |      AS h
         |  FROM st),
         |c AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt
         |  FROM w GROUP BY h)
         |SELECT w.source,
         |  CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_windows,
         |  CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS dup_ppm
         |FROM w JOIN c USING (h)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q285_chunk_windows" ->
      // same tokenizer as q19; starts = 0, 24, 48, ... < n via
      // generate_series (inclusive end n-1); list_slice clamps the
      // final suffix window exactly as Spark's slice does
      s"""WITH tok AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |t AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM tok WHERE len(toks) > 0),
         |st AS (SELECT doc_id, toks, n,
         |    unnest(generate_series(0, n - 1, 24)) AS start
         |  FROM t)
         |SELECT doc_id,
         |  CAST(start // 24 + 1 AS BIGINT) AS chunk_idx,
         |  CAST(start AS BIGINT) AS start_token,
         |  CAST(LEAST(32, n - start) AS BIGINT) AS n_tokens,
         |  array_to_string(list_slice(toks, start + 1, start + 32), ' ')
         |    AS chunk_text
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "q255_water_filling" ->
      // same tokenizer as q19; budget = (3·total) // 5 (Scala's
      // total*3/5 on positive longs); the water level solved on the
      // sorted per-source frame exactly as the operator does
      s"""WITH t AS (SELECT source, CAST(len($SqlToks) AS BIGINT) AS tok
         |  FROM documents),
         |per AS (SELECT source, CAST(sum(tok) AS BIGINT) AS n_tokens
         |        FROM t GROUP BY 1),
         |b AS (SELECT (sum(n_tokens) * 3) // 5 AS budget FROM per),
         |r AS (SELECT source, n_tokens,
         |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT)
         |      AS k,
         |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
         |    CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM per),
         |f AS (SELECT r.*,
         |    (p - n_tokens + (n - k + 1) * n_tokens) <= b.budget AS ok
         |  FROM r, b),
         |c AS (SELECT CASE
         |    WHEN max(CASE WHEN ok THEN k END) IS NULL
         |      THEN (SELECT budget FROM b) // greatest(max(n), 1)
         |    WHEN max(CASE WHEN ok THEN k END) = max(n)
         |      THEN 9223372036854775807
         |    ELSE ((SELECT budget FROM b) - max(CASE WHEN ok THEN p END))
         |      // (max(n) - max(CASE WHEN ok THEN k END)) END AS cap
         |  FROM f)
         |SELECT source, n_tokens,
         |  CAST(least(n_tokens, c.cap) AS BIGINT) AS alloc,
         |  n_tokens > c.cap AS capped
         |FROM r, c ORDER BY source""".stripMargin,
    "q242_quality_skyline" ->
      // quality formula identical to q19; frontier by the textbook
      // quadratic NOT-EXISTS dominance definition (strict somewhere)
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |m AS (SELECT doc_id,
         | CAST(len(toks) AS BIGINT) AS n_tokens,
         | CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS n_punct,
         | CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS BIGINT) AS n_stop,
         | length(text) AS n_chars
         | FROM t),
         |p AS (SELECT doc_id, n_tokens,
         | least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
         | + (1.0 - (CASE WHEN n_chars = 0 THEN 0.0
         |           ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END)) * 0.25
         | + (CASE WHEN n_tokens = 0 THEN 0.0
         |    ELSE CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) END) * 0.25 AS q
         | FROM m)
         |SELECT doc_id, n_tokens, round(q, 6) AS quality FROM p pp
         |WHERE NOT EXISTS (SELECT 1 FROM p d
         |  WHERE d.q >= pp.q AND d.n_tokens <= pp.n_tokens
         |    AND (d.q > pp.q OR d.n_tokens < pp.n_tokens))
         |ORDER BY doc_id""".stripMargin,
    "q19_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |m AS (SELECT doc_id,
         | CAST(len(toks) AS BIGINT) AS n_tokens,
         | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe,
         | CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS n_punct,
         | CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS BIGINT) AS n_stop,
         | length(text) AS n_chars
         | FROM t)
         |SELECT doc_id, n_tokens, n_bpe, n_punct, n_stop,
         | least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
         | + (1.0 - (CASE WHEN n_chars = 0 THEN 0.0
         |           ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END)) * 0.25
         | + (CASE WHEN n_tokens = 0 THEN 0.0
         |    ELSE CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) END) * 0.25 AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "q20_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |sc AS (SELECT doc_id,
         | CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS BIGINT) AS s_de,
         | CAST(len(list_filter(toks, x -> x IN ('the','a','is','of','and','to','in','it'))) AS BIGINT) AS s_en,
         | CAST(len(list_filter(toks, x -> x IN ('el','la','y','es','de','que','un','en'))) AS BIGINT) AS s_es,
         | CAST(len(list_filter(toks, x -> x IN ('le','la','et','est','les','des','un','une'))) AS BIGINT) AS s_fr
         | FROM t)
         |SELECT doc_id, s_de, s_en, s_es, s_fr,
         | CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |      WHEN s_es >= s_de AND s_es >= s_en AND s_es >= s_fr THEN 'es'
         |      WHEN s_fr >= s_de AND s_fr >= s_en AND s_fr >= s_es THEN 'fr'
         |      ELSE 'und' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q21_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |sh AS (SELECT doc_id, text,
         | CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(generate_series(1, len(toks) - 4),
         |            i -> array_to_string(list_slice(toks, i, i + 4), ' ')) END AS shingles
         | FROM t)
         |SELECT doc_id,
         | md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_md5,
         | list_min(list_transform(shingles, x -> md5(x))) AS fp_winnow
         |FROM sh ORDER BY doc_id""".stripMargin,
    "q47_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($SqlToks) AS term FROM documents),
         |tfq AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
         |nq AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT tfq.doc_id, tfq.term,
         |  CAST(tfq.tf * nq.n AS DOUBLE) / dfq.df AS score
         | FROM tfq JOIN dfq ON tfq.term = dfq.term CROSS JOIN nq),
         |ranked AS (SELECT doc_id, term, score, row_number() OVER (
         |  PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM scored)
         |SELECT doc_id, term AS top_term, round(score, 6) AS score
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q56_normalize" ->
      """WITH m AS (SELECT doc_id,
        |  'e' || chr(769) || chr(9) || ' ' || text || '  x' || chr(160) || 'y' AS messy
        | FROM documents),
        |c AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(messy),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text
        | FROM m)
        |SELECT doc_id, clean_text,
        | CAST(length(clean_text) AS BIGINT) AS n_chars_clean
        |FROM c ORDER BY doc_id""".stripMargin,
    "q57_pii_mask" ->
      """WITH c AS (SELECT c_custkey,
        |  replace(lower(c_name), ' ', '.') || '@corp' || c_nationkey ||
        |  '.example.com call 555-' || c_custkey || ' or (41) 555-0199' AS contact
        | FROM customer)
        |SELECT c_custkey,
        | regexp_replace(regexp_replace(contact,
        |   '[a-z0-9.#]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
        |   '[0-9]{3}-[0-9]+', '[PHONE]', 'g') AS contact_masked
        |FROM c ORDER BY c_custkey""".stripMargin,
    "q58_hash_split" ->
      """WITH h AS (SELECT lang,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 100 AS h
        | FROM documents)
        |SELECT lang,
        | CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END
        |   AS split,
        | count(*) AS n
        |FROM h GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q59_chunking" ->
      s"""WITH tok AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |b AS (SELECT doc_id, toks, len(toks) AS n FROM tok),
         |c AS (SELECT doc_id, toks,
         |  unnest(generate_series(0,
         |    CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 23) // 24 END)) AS chunk_idx
         | FROM b)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         | CAST(len(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32))
         |   AS BIGINT) AS n_tokens,
         | md5(array_to_string(
         |   list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' '))
         |   AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q60_repetition_quality" ->
      s"""WITH tok AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |b AS (SELECT doc_id, toks, len(toks) AS n FROM tok),
         |stats AS (SELECT doc_id, n,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(n AS DOUBLE)
         |    AS distinct_frac,
         |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
         |    / CAST(n AS DOUBLE) AS mean_word_len
         | FROM b),
         |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, n - 1),
         |   i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM b),
         |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
         |top AS (SELECT doc_id,
         |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
         | FROM bgc GROUP BY doc_id)
         |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens, s.distinct_frac,
         | s.mean_word_len, t.top_bigram_frac
         |FROM stats s LEFT JOIN top t ON t.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin,
    "q64_vocab" ->
      s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS token FROM documents)
         |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM tok GROUP BY token ORDER BY tf DESC, token LIMIT 20""".stripMargin,
    "q69_sequence_packing" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($SqlToks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |dd AS (SELECT * FROM d WHERE n_tokens > 0),
         |o AS (SELECT doc_id, n_tokens,
         |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
         | FROM dd)
         |SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
         | CAST(start_offset // 512 AS BIGINT) AS first_seq,
         | CAST((start_offset + n_tokens - 1) // 512 AS BIGINT) AS last_seq,
         | CAST((start_offset + n_tokens - 1) // 512
         |   - start_offset // 512 + 1 AS BIGINT) AS n_seqs
         |FROM o ORDER BY doc_id""".stripMargin,
    "q76_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |e AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
         |SELECT term, count(*) AS df,
         | array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings_csv
         |FROM e GROUP BY term ORDER BY term""".stripMargin,
    "q77_keyword_search" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents)
         |SELECT doc_id FROM t
         |WHERE list_contains(toks, 'merge') AND list_contains(toks, 'vector')
         |ORDER BY doc_id""".stripMargin,
    "q91_corpus_quality" ->
      s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS t FROM documents),
         |vocab AS (SELECT t, count(*) AS df FROM tok GROUP BY t)
         |SELECT doc_id, count(*) AS n_tokens,
         | round(CAST(sum(df) AS DOUBLE) / count(*), 6) AS mean_token_df,
         | round(CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |   / count(*), 6) AS rare_frac
         |FROM tok JOIN vocab USING (t)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q92_curation_pipeline" ->
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |qm AS (SELECT c.doc_id, c.text, CAST(len(tok.toks) AS BIGINT) AS n_tokens,
         |  CAST(length(c.text) - length(regexp_replace(c.text,
         |    '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(list_filter(tok.toks, x -> x IN
         |    ('the','a','of','and','to','in','is','it','for','on'))) AS BIGINT) AS n_stop,
         |  length(c.text) AS n_chars
         | FROM corpus c JOIN tok ON tok.doc_id = c.doc_id),
         |q AS (SELECT doc_id, text, n_tokens,
         |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
         |  + (1.0 - (CASE WHEN n_chars = 0 THEN 0.0
         |            ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END)) * 0.25
         |  + (CASE WHEN n_tokens = 0 THEN 0.0
         |     ELSE CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) END) * 0.25 AS quality
         | FROM qm),
         |sc AS (SELECT * FROM q WHERE quality >= 0.45),
         |reps AS (SELECT min(doc_id) AS doc_id FROM sc
         | GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |bdoc AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |btok AS (SELECT doc_id, $SqlToks AS toks FROM bdoc),
         |bshl AS (SELECT doc_id,
         | CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(generate_series(1, len(toks) - 2),
         |            i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END AS shingles
         | FROM btok),
         |bsh AS (SELECT DISTINCT sh FROM (SELECT unnest(shingles) AS sh FROM bshl) WHERE sh <> ''),
         |m AS (SELECT s.doc_id, count(*) AS n_matched
         | FROM s JOIN bsh ON s.sh = bsh.sh GROUP BY 1),
         |n AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY 1),
         |contam AS (SELECT n.doc_id FROM n LEFT JOIN m ON m.doc_id = n.doc_id
         | WHERE CAST(coalesce(m.n_matched, 0) AS DOUBLE)
         |   / CAST(n.n_shingles AS DOUBLE) >= 0.5)
         |SELECT sc.doc_id, sc.n_tokens, round(sc.quality, 6) AS quality
         |FROM sc JOIN reps ON reps.doc_id = sc.doc_id
         |WHERE sc.doc_id NOT IN (SELECT doc_id FROM contam)
         |ORDER BY sc.doc_id""".stripMargin,
    "q93_line_boilerplate" ->
      s"""WITH pages AS (SELECT doc_id,
         |  'Subscribe to our newsletter' || chr(10) ||
         |  CASE WHEN doc_id % 3 = 0
         |    THEN 'Cookie notice: we use cookies' || chr(10) ELSE '' END ||
         |  text || chr(10) || '(c) 2026 Example Corp' || chr(10) ||
         |  'All rights reserved' AS page FROM documents),
         |l AS (SELECT doc_id,
         |  generate_subscripts(string_split(page, chr(10)), 1) AS idx,
         |  unnest(string_split(page, chr(10))) AS line FROM pages),
         |lk AS (SELECT doc_id, idx, line, trim(line) AS k FROM l),
         |f AS (SELECT k, count(*) AS df FROM
         |  (SELECT DISTINCT doc_id, k FROM lk) GROUP BY k)
         |SELECT doc_id,
         | md5(coalesce(array_to_string(list(line ORDER BY idx) FILTER (df <= 50),
         |   chr(10)), '')) AS clean_md5,
         | CAST(count(*) FILTER (df <= 50) AS BIGINT) AS n_lines_kept,
         | CAST(count(*) FILTER (df > 50) AS BIGINT) AS n_lines_dropped
         |FROM lk JOIN f USING (k)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q95_repetition" ->
      s"""WITH pages AS (SELECT doc_id,
         |  text || chr(10) || 'visit example dot com' || chr(10) ||
         |  CASE WHEN doc_id % 4 = 0 THEN 'visit example dot com' || chr(10)
         |    || 'visit example dot com' || chr(10) ELSE '' END ||
         |  'end of page' AS text
         | FROM documents),
         |t AS (SELECT doc_id, text, $SqlToks AS toks FROM pages),
         |bg AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS g
         |  FROM t WHERE len(toks) >= 2),
         |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |agg AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot,
         |  count(*) AS dst FROM cnt GROUP BY 1),
         |ln AS (SELECT doc_id, len(toks) AS n_toks,
         |  list_filter(list_transform(string_split(text, chr(10)),
         |    x -> trim(x)), x -> length(x) > 0) AS ls
         | FROM t)
         |SELECT ln.doc_id,
         | CAST(len(ls) AS BIGINT) AS n_lines,
         | round(CASE WHEN len(ls) = 0 THEN 0.0
         |   ELSE CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
         |   END, 6) AS dup_line_frac,
         | CAST(coalesce(agg.top_c, 0) AS BIGINT) AS top_bigram_count,
         | round(CASE WHEN n_toks < 2 THEN 0.0
         |   ELSE CAST(agg.top_c * 2 AS DOUBLE) / n_toks END, 6) AS top_bigram_frac,
         | round(CASE WHEN n_toks < 2 THEN 0.0
         |   ELSE 1.0 - CAST(agg.dst AS DOUBLE) / agg.tot END, 6) AS dup_bigram_frac
         |FROM ln LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q96_pii_redact" ->
      """WITH pages AS (SELECT doc_id,
        |  text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' ||
        |    CAST(doc_id % 200 AS VARCHAR) || '.7' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' call +49151234' ||
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ELSE '' END AS page
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(page,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(page,
        |   '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        | CAST(len(regexp_extract_all(page, '\+[0-9]{7,15}')) AS BIGINT) AS n_phones,
        | md5(regexp_replace(regexp_replace(regexp_replace(page,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |   '\+[0-9]{7,15}', '<PHONE>', 'g')) AS redacted_md5
        |FROM pages ORDER BY doc_id""".stripMargin,
    "q98_bpe_merges" -> {
      // 8 BPE merge rounds unrolled as CTE stages: pair-count ->
      // arg-max -> literal merge, the exact loop BpeTrainer runs.
      // Integer frequencies and the lexicographic tie-break make the
      // rule sequence engine-independent.
      val stages = (0 until 8).map { n =>
        s"""p$n AS (
           |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS freq
           |  FROM (SELECT l, cnt, unnest(generate_series(1, len(l)-1)) AS i
           |        FROM (SELECT string_split(trim(seq), '  ') AS l, cnt FROM wf$n))
           |  GROUP BY 1, 2),
           |b$n AS (SELECT a, b, freq FROM p$n ORDER BY freq DESC, a, b LIMIT 1),
           |wf${n + 1} AS (
           |  SELECT replace(seq, ' ' || a || '  ' || b || ' ',
           |                 ' ' || a || b || ' ') AS seq, cnt
           |  FROM wf$n, b$n)""".stripMargin
      }.mkString(",\n")
      val union = (0 until 8)
        .map(n => s"SELECT ${n + 1} AS rank, a, b, freq FROM b$n")
        .mkString(" UNION ALL ")
      s"""WITH words AS (
         |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents),
         |wf0 AS (
         |  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS seq, count(*) AS cnt
         |  FROM words WHERE w <> '' GROUP BY 1),
         |$stages
         |SELECT * FROM ($union) ORDER BY rank""".stripMargin
    },
    "q100_ngram_lm" ->
      // per-bigram ln rounded to 6dp, summed in DECIMAL: totals exact.
      // DuckDB ln == natural log (its log() is log10 — do not use).
      s"""WITH tok AS (SELECT doc_id, $SqlToks AS t FROM documents),
         |bi AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
         |        FROM tok WHERE len(t) >= 2)),
         |counts AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |           FROM bi GROUP BY w1, w2),
         |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS ctx1
         |        FROM counts GROUP BY w1),
         |voc AS (SELECT count(DISTINCT w) AS v FROM
         |        (SELECT unnest(t) AS w FROM tok)),
         |lp AS (
         |  SELECT bi.doc_id,
         |    CAST(round(ln(CAST(c12 + 1 AS DOUBLE) / CAST(ctx1 + v AS DOUBLE)), 6)
         |         AS DECIMAL(18,6)) AS lp
         |  FROM bi
         |  JOIN counts ON counts.w1 = bi.w1 AND counts.w2 = bi.w2
         |  JOIN ctx ON ctx.w1 = bi.w1
         |  CROSS JOIN voc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(lp) AS DOUBLE) + 0.0 AS sum_logp
         |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q106_token_entropy" ->
      // Σ c·round(ln(c/n),6) summed in DECIMAL — exact; H = −sum/n.
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
         |      FROM (SELECT doc_id, unnest(toks) AS w FROM t)
         |      GROUP BY doc_id, w),
         |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |        CAST(count(*) AS BIGINT) AS n_distinct
         |      FROM c GROUP BY doc_id),
         |terms AS (SELECT c.doc_id, n.n, n.n_distinct,
         |    c.c * CAST(round(ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)), 6)
         |          AS DECIMAL(18,6)) AS t
         |  FROM c JOIN n ON n.doc_id = c.doc_id)
         |SELECT doc_id, min(n) AS n_tokens, min(n_distinct) AS n_distinct,
         |  CAST(sum(t) AS DOUBLE) + 0.0 AS sum_clogp
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q107_pmi_collocations" ->
      // numerator/denominator products kept in the same left-assoc
      // order as the Spark expression -> identical doubles; ln rounded
      // to 6dp absorbs the ≤1-ulp libm difference.
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
         |        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |       FROM (SELECT toks[i] AS w1, toks[i+1] AS w2
         |             FROM (SELECT toks,
         |                     unnest(generate_series(1, len(toks)-1)) AS i
         |                   FROM t WHERE len(toks) >= 2))
         |       GROUP BY w1, w2),
         |nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
         |nb AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM bi)
         |SELECT bi.w1, bi.w2, bi.c12,
         |  round(ln((CAST(c12 AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE))
         |         / (CAST(nb AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6)
         |    AS pmi
         |FROM bi JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE c12 >= 5
         |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    "q110_bpe_encode" -> bpeEncodeSql,
    "q317_bpe_index_reuse" -> bpeEncodeSql,
    "q121_bm25" ->
      // same expression tree as the operator: ln rounded to 6dp, each
      // term score rounded to 6dp and summed in DECIMAL, avg_len a
      // single double division. DuckDB ln == natural log.
      s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS term FROM documents),
         |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
         |         FROM tok GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_len
         |       FROM lens),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
         |       WHERE term IN ('merge', 'vector', 'stream')
         |       GROUP BY doc_id, term),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |    CAST(round(
         |      round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
         |               (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) *
         |      (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         |      (CAST(tf AS DOUBLE) +
         |       1.2 * (1.0 - 0.75 + 0.75 * CAST(len AS DOUBLE) / avg_len)), 6)
         |      AS DECIMAL(18,6)) AS ts
         |  FROM tf JOIN dfq ON dfq.term = tf.term
         |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN st)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         |  CAST(sum(ts) AS DOUBLE) AS score
         |FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q127_rrf" ->
      // q121's BM25 CTE (docs >= 10) + q26's cosine rank, fused by
      // 1/(60+rank); absent ranks coalesce to 0 (never NULL)
      s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS term
         |             FROM documents WHERE doc_id >= 10),
         |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
         |         FROM tok GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_len
         |       FROM lens),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
         |       WHERE term IN ('merge', 'vector', 'stream')
         |       GROUP BY doc_id, term),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |    CAST(round(
         |      round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
         |               (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) *
         |      (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         |      (CAST(tf AS DOUBLE) +
         |       1.2 * (1.0 - 0.75 + 0.75 * CAST(len AS DOUBLE) / avg_len)), 6)
         |      AS DECIMAL(18,6)) AS ts
         |  FROM tf JOIN dfq ON dfq.term = tf.term
         |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN st),
         |bmtop AS (SELECT doc_id, CAST(sum(ts) AS DOUBLE) AS score
         |  FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
         |bm AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rb
         | FROM bmtop),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |      FROM embeddings WHERE vec_id = 0),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |      FROM embeddings WHERE vec_id >= 10),
         |annr AS (SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id)
         |           AS rank
         |  FROM (SELECT vec_id, ${sqlCosine("qv", "cv")} AS sim FROM q, c)),
         |ann AS (SELECT vec_id AS doc_id, CAST(rank AS BIGINT) AS ra
         |        FROM annr WHERE rank <= 50),
         |f AS (SELECT coalesce(bm.doc_id, ann.doc_id) AS doc_id,
         |       coalesce(rb, 0) AS bm25_rank, coalesce(ra, 0) AS ann_rank,
         |       round(coalesce(1.0 / (60.0 + CAST(rb AS DOUBLE)), 0.0) +
         |             coalesce(1.0 / (60.0 + CAST(ra AS DOUBLE)), 0.0), 9) AS rrf
         |      FROM bm FULL OUTER JOIN ann ON ann.doc_id = bm.doc_id)
         |SELECT doc_id, bm25_rank, ann_rank, rrf FROM f
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q132_retrieval_eval" ->
      // q27's IVF SQL at k=10 judged against the exact top-10; all
      // log2 discounts rounded to 6dp and summed in DECIMAL
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id >= 10),
         |ex AS (SELECT label, generate_subscripts(cv, 1) AS dim, unnest(cv) AS x FROM c),
         |cm AS (SELECT label, dim,
         |  CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS m
         | FROM ex GROUP BY label, dim),
         |cent AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cm GROUP BY label),
         |probe AS (SELECT query_id, qv, label FROM (
         |  SELECT q.query_id, q.qv, cent.label,
         |   row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY ${sqlCosine("q.qv", "cent.centroid")} DESC, cent.label) AS crank
         |  FROM q, cent) WHERE crank <= 3),
         |scored AS (SELECT p.query_id, c.vec_id, ${sqlCosine("p.qv", "c.cv")} AS sim
         | FROM probe p JOIN c ON c.label = p.label),
         |sysr AS (SELECT query_id, vec_id AS neighbor_id, rank FROM (
         |  SELECT query_id, vec_id,
         |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored) WHERE rank <= 10),
         |ts AS (SELECT q.query_id, c.vec_id, ${sqlCosine("q.qv", "c.cv")} AS sim
         |  FROM q, c),
         |truth AS (SELECT query_id, vec_id AS neighbor_id, t_rank FROM (
         |  SELECT query_id, vec_id,
         |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS t_rank
         |  FROM ts) WHERE t_rank <= 10),
         |judged AS (SELECT s.query_id, s.rank,
         |  CASE WHEN t.neighbor_id IS NULL THEN 0 ELSE 1 END AS rel
         | FROM sysr s LEFT JOIN truth t
         |   ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id),
         |pq AS (SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_hits,
         |  min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         |  sum(CASE WHEN rel = 1 THEN
         |      CAST(round(1.0 / log2(CAST(rank AS DOUBLE) + 1.0), 6) AS DECIMAL(18,6))
         |    ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS dcg
         | FROM judged GROUP BY query_id),
         |ic AS (SELECT query_id,
         |  sum(CAST(round(1.0 / log2(CAST(t_rank AS DOUBLE) + 1.0), 6)
         |    AS DECIMAL(18,6))) AS idcg
         | FROM truth GROUP BY query_id)
         |SELECT pq.query_id, n_hits,
         |  round(CAST(n_hits AS DOUBLE) / 10.0, 6) AS recall_at_10,
         |  coalesce(round(1.0 / CAST(first_rel AS DOUBLE), 6), 0.0) AS mrr,
         |  round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg_at_10
         |FROM pq JOIN ic ON ic.query_id = pq.query_id
         |ORDER BY pq.query_id""".stripMargin,
    "q147_keyness" ->
      // +0.5-smoothed log-odds z from four exact integer counts;
      // round to 6dp BEFORE ranking so both engines order identically
      s"""WITH tok AS (SELECT lang, unnest($SqlToks) AS term FROM documents),
        |cnt AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS y_g
        |        FROM tok GROUP BY lang, term),
        |gt AS (SELECT lang, CAST(sum(y_g) AS BIGINT) AS n_g
        |       FROM cnt GROUP BY lang),
        |tt AS (SELECT term, CAST(sum(y_g) AS BIGINT) AS y_all
        |       FROM cnt GROUP BY term),
        |tot AS (SELECT CAST(sum(y_g) AS BIGINT) AS n_all FROM cnt),
        |sc AS (SELECT cnt.lang, cnt.term, cnt.y_g,
        |    tt.y_all - cnt.y_g AS y_rest, gt.n_g,
        |    tot.n_all - gt.n_g AS n_rest
        |  FROM cnt JOIN gt USING (lang) JOIN tt USING (term) CROSS JOIN tot),
        |z AS (SELECT lang, term, y_g, y_rest,
        |    round((ln((y_g + 0.5) / (n_g - y_g + 0.5))
        |         - ln((y_rest + 0.5) / (n_rest - y_rest + 0.5)))
        |      / sqrt(1.0 / (y_g + 0.5) + 1.0 / (y_rest + 0.5)), 6) AS z
        |  FROM sc),
        |rk AS (SELECT lang, CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY z DESC, term) AS BIGINT) AS rank,
        |    term, y_g, y_rest, z FROM z)
        |SELECT lang, rank, term, y_g, y_rest, z FROM rk
        |WHERE rank <= 8 ORDER BY lang, rank""".stripMargin,

    // fixed-budget peel: 12 unrolled rounds, each "keep nodes with >= 3
    // surviving neighbors, restrict edges to kept endpoints",
    "q162_readability" ->
      // same greedy vowel-run heuristic, per-token >= 1 clamp, and the
      // fixed Flesch formula over exact integer counts
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |c AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(list_sum(list_transform(toks, w ->
         |      greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))))
         |      AS BIGINT) AS n_syllables,
         |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
         |      AS BIGINT) AS n_sentences
         |  FROM t)
         |SELECT doc_id, n_words, n_syllables, n_sentences,
         |  round(CAST(206.835 AS DOUBLE)
         |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE)
         |        / CAST(n_sentences AS DOUBLE))
         |    - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE)
         |        / CAST(n_words AS DOUBLE)), 6) AS reading_ease
         |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    "q164_chunking" ->
      // same 1-based slices over the same token list; chunk_idx =
      // start DIV stride is shared integer arithmetic
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |      FROM t WHERE len(toks) > 0),
         |st AS (SELECT doc_id, toks, n,
         |    unnest(generate_series(0, CAST(n - 1 AS INT), 30)) AS start
         |  FROM n)
         |SELECT doc_id, CAST(start // 30 AS BIGINT) AS chunk_idx,
         |  CAST(len(list_slice(toks, CAST(start + 1 AS INT),
         |    CAST(least(start + 40, n) AS INT))) AS BIGINT) AS n_tokens,
         |  array_to_string(list_slice(toks, CAST(start + 1 AS INT),
         |    CAST(least(start + 40, n) AS INT)), ' ') AS chunk_text
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "q180_kwic" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |x AS (SELECT doc_id, toks,
         |  unnest(generate_series(1, len(toks))) AS p FROM t),
         |hits AS (SELECT doc_id, p, toks[p] AS term,
         |  array_to_string(toks[greatest(1, p - 3):least(p + 3, len(toks))],
         |    ' ') AS context
         | FROM x WHERE toks[p] IN ('merge', 'vector', 'window'))
         |SELECT doc_id, CAST(p AS BIGINT) AS pos, term, context
         |FROM hits ORDER BY doc_id, pos""".stripMargin,
    "q192_length_buckets" ->
      s"""WITH t AS (SELECT doc_id, len($SqlToks) AS n_tok FROM documents),
         |b AS (SELECT doc_id, n_tok,
         |  CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
         |    WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
         |    WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
         |    ELSE 1024 END AS bucket
         | FROM t WHERE n_tok <= 1024)
         |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         | CAST(sum(bucket - n_tok) AS BIGINT) AS n_padding,
         | CAST(sum(bucket - n_tok) * 1000000 AS BIGINT)
         |   // CAST(bucket * count(*) AS BIGINT) AS waste_ppm
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q199_oov_rate" ->
      s"""WITH toks AS (SELECT source, unnest($SqlToks) AS tok FROM documents),
         |vocab AS (SELECT tok FROM (SELECT tok, count(*) AS n FROM toks
         |  GROUP BY tok ORDER BY n DESC, tok LIMIT 1000))
         |SELECT source, count(*) AS n_tokens,
         | CAST(coalesce(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END), 0)
         |   AS BIGINT) AS n_oov,
         | CAST(coalesce(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END), 0)
         |   * 1000000 AS BIGINT) // CAST(count(*) AS BIGINT) AS oov_ppm
         |FROM toks LEFT JOIN vocab v ON v.tok = toks.tok
         |GROUP BY source ORDER BY source""".stripMargin,
    "q200_datacard" ->
      s"""WITH base AS (SELECT count(*) AS n_docs,
         |  CAST(sum(len($SqlToks)) AS BIGINT) AS n_bpe,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources FROM documents),
         |$SqlCorpus,
         |$SqlShingles3,
         |sn AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM com
         | JOIN sn n1 ON n1.doc_id = com.id1 JOIN sn n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |dup AS (SELECT CAST(count(*) AS BIGINT) AS n_dup_docs FROM
         |  (SELECT DISTINCT id % 1000000 FROM
         |    (SELECT id1 AS id FROM pairs UNION ALL SELECT id2 FROM pairs)))
         |SELECT n_docs, n_bpe AS n_tokens, n_langs, n_sources, n_dup_docs,
         | CAST(n_dup_docs * 1000000 AS BIGINT) // CAST(n_docs AS BIGINT)
         |   AS dup_ppm,
         | CAST(n_bpe * 1000 AS BIGINT) // CAST(n_docs AS BIGINT)
         |   AS mean_tokens_permille
         |FROM base CROSS JOIN dup""".stripMargin,
    "q208_pii_mask" ->
      // fixtures derived identically on both engines (see q208PiiMask);
      // the assertion is the PiiMask mask/validate/count expression set
      """WITH base AS (SELECT c_custkey,
        |  lpad(CAST(c_nationkey AS VARCHAR), 2, '0') || '-' ||
        |  lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') AS ph0
        | FROM customer WHERE c_custkey <= 1000),
        |fix AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 10 = 0 THEN ph0 || 'x' ELSE ph0 END AS ph,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'reach u'
        |         || CAST(c_custkey AS VARCHAR) || '@example.com or x'
        |         || CAST(c_custkey AS VARCHAR) || '@test.org'
        |       WHEN c_custkey % 3 = 1 THEN 'no contact info'
        |       ELSE 'mail: a' || CAST(c_custkey AS VARCHAR) || '@mail.net'
        |  END AS cm
        | FROM base)
        |SELECT c_custkey,
        | CASE WHEN ph IS NULL THEN NULL
        |      WHEN length(ph) <= 4 THEN ph
        |      ELSE regexp_replace(substr(ph, 1, length(ph) - 4),
        |             '[0-9]', '*', 'g')
        |           || substr(ph, length(ph) - 3, 4) END AS masked_phone,
        | regexp_matches(ph, '^[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}$')
        |   AS phone_valid,
        | CAST(len(regexp_split_to_array(cm,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1
        |   AS BIGINT) AS n_emails
        |FROM fix ORDER BY c_custkey""".stripMargin,
    "q209_trigram_repetition" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tg AS (SELECT doc_id,
         |  unnest(list_transform(generate_series(1, len(toks) - 2),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tri
         | FROM t WHERE len(toks) >= 3),
         |c AS (SELECT doc_id, tri, count(*) AS c FROM tg GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
         | count(*) AS n_distinct,
         | round(CAST(1 AS DOUBLE) - CAST(count(*) AS DOUBLE)
         |   / CAST(sum(c) AS DOUBLE), 6) AS repetition_ratio
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q217_novelty" ->
      // distinct (doc, trigram); first bearer per trigram type by min
      // doc_id; novel = types this doc bears first; exact integer ppm
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tg AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(generate_series(1, len(toks) - 2),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tri
         | FROM t WHERE len(toks) >= 3),
         |fst AS (SELECT tri, min(doc_id) AS first_doc FROM tg GROUP BY tri)
         |SELECT tg.doc_id, count(*) AS n_tri_types,
         | CAST(coalesce(sum(CASE WHEN fst.first_doc = tg.doc_id
         |   THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_novel,
         | CAST(sum(CASE WHEN fst.first_doc = tg.doc_id THEN 1 ELSE 0 END)
         |   * 1000000 // count(*) AS BIGINT) AS novelty_ppm
         |FROM tg JOIN fst ON fst.tri = tg.tri
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin,
    "q233_js_divergence" ->
      // mirrors jsDivergence term by term: DECIMAL(38,0) products,
      // 6-dp-rounded ln terms summed in DECIMAL(28,6), ln2 pinned to
      // the same 6-dp literal, absent-token mass in closed form
      s"""WITH t AS (SELECT source, $SqlToks AS toks FROM documents),
         |u AS (SELECT source, unnest(toks) AS w FROM t),
         |cs AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
         |  FROM u GROUP BY 1, 2),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |  FROM cs GROUP BY 1),
         |cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM cs GROUP BY 1),
         |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM cw),
         |j AS (SELECT cs.source, ns.n, tot.nn, cs.c, cw.cw,
         |  CAST(CAST(cs.c AS DECIMAL(19,0)) * CAST(tot.nn AS DECIMAL(19,0))
         |    AS DECIMAL(38,0)) AS cn,
         |  CAST(CAST(cw.cw AS DECIMAL(19,0)) * CAST(ns.n AS DECIMAL(19,0))
         |    AS DECIMAL(38,0)) AS bign
         | FROM cs JOIN ns USING (source) JOIN cw USING (w) CROSS JOIN tot),
         |terms AS (SELECT source, n, nn, cw,
         |  CAST(CAST(c AS DECIMAL(19,0)) * CAST(round(ln(
         |    (2.0 * CAST(cn AS DOUBLE)) / CAST(CAST(cn + bign AS DECIMAL(38,0)) AS DOUBLE)), 6)
         |    AS DECIMAL(18,6)) AS DECIMAL(28,6)) AS ta,
         |  CAST(CAST(cw AS DECIMAL(19,0)) * CAST(round(ln(
         |    (2.0 * CAST(bign AS DOUBLE)) / CAST(CAST(cn + bign AS DECIMAL(38,0)) AS DOUBLE)), 6)
         |    AS DECIMAL(18,6)) AS DECIMAL(28,6)) AS tb
         | FROM j),
         |agg AS (SELECT source, n, nn,
         |  CAST(sum(ta) AS DECIMAL(28,6)) AS sa,
         |  CAST(sum(tb) AS DECIMAL(28,6)) AS sb,
         |  CAST(sum(cw) AS BIGINT) AS cin
         | FROM terms GROUP BY 1, 2, 3)
         |SELECT source, n AS n_tokens,
         | round(0.5 * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
         |   + 0.5 * (CAST(sb AS DOUBLE) / CAST(nn AS DOUBLE))
         |   + 0.5 * 0.693147 * (1.0 - CAST(cin AS DOUBLE) / CAST(nn AS DOUBLE))
         |   + 0.0, 6) AS jsd
         |FROM agg ORDER BY source""".stripMargin)
}
