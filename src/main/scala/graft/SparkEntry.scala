package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Merge, Ordinals}
import graft.operators.Merge.{DuplicateMode, ImportMode, Key}

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each with a DuckDB-equivalent oracle in [[SparkEntry.oracleSql]].
  *
  * Parity conventions (so results hash-match the DuckDB oracle):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregations go through explicit DECIMAL casts (FP summation
  *    order differs between engines; decimals are exact and associative);
  *  - raw (non-aggregated) doubles pass through untouched — both engines
  *    read the same parquet bits;
  *  - every result carries a deterministic total ORDER BY.
  */
object SparkEntry {

  import Tables._

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q92CurationPipeline(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- q01
  /** Pricing-summary scan+aggregate (filter pushdown + partial aggregation;
    * the "big import with statistics" analog of reference
    * DbImportWorker.java:879-934 run as a query).
    */
  def q01ScanAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---------------------------------------------------------------- q02
  /** Multi-way dimension join + aggregate. nation/region are broadcast by
    * AQE; only orders⨝customer shuffles.
    */
  def q02JoinDims(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" && col("o_orderdate") >= lit("1995-01-01"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("n_name"))

  // ---------------------------------------------------------------- q03
  /** insertNotExistingItems probe: left-anti join on the merge keys
    * (reference DbImportWorker.java:494 / SURVEY §2.4).
    */
  def q03AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  // ---------------------------------------------------------------- q04
  /** NoSQL existence probe: left-semi join (reference
    * DbNoSqlImportWorker.java:342 / SURVEY §2.4).
    */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  // ---------------------------------------------------------------- q05
  /** dropDuplicates keep-FIRST-occurrence (reference DbUtilities
    * .dropDuplicates, SURVEY §2.5) — window row_number, not Spark's
    * order-unstable dropDuplicates.
    */
  def q05DropDuplicatesFirst(s: SparkSession, d: String): DataFrame =
    // (l_orderkey, l_linenumber) is NOT unique in the test data; the
    // keep-first order must be total or the survivor is nondeterministic.
    Dedup.dropDuplicatesKeepFirst(
        lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_extendedprice")),
        Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"))

  // ---------------------------------------------------------------- q06
  /** joinDuplicates: merge each duplicate group, later rows win; the
    * ignore-null variant keeps the last NON-null per column
    * (updateWithNullValues=false, reference README.md:87, SURVEY §2.5).
    */
  def q06JoinDuplicates(s: SparkSession, d: String): DataFrame = {
    val src = events(s, d).select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "click", lit(null)).otherwise(col("value")).as("v"),
      col("props"))
    val inclNull = Dedup.joinDuplicates(
        src.select(col("user_id"), col("event_id"), col("v")),
        Seq("user_id"), col("event_id"), updateWithNull = true)
      .withColumnRenamed("v", "last_v_incl_null").drop("event_id")
    val nonNull = Dedup.joinDuplicates(
        src.select(col("user_id"), col("event_id"), col("v"), col("props")),
        Seq("user_id"), col("event_id"), updateWithNull = false)
      .withColumnRenamed("v", "last_v_non_null")
      .withColumnRenamed("props", "last_props").drop("event_id")
    inclNull.join(nonNull, Seq("user_id")).orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q07
  /** detectDuplicates: how many key groups occur more than once
    * (reference gate for UPDATE_FIRST modes, SURVEY §2.5).
    */
  def q07DetectDuplicates(s: SparkSession, d: String): DataFrame =
    Dedup.duplicateKeyGroups(lineitem(s, d), Seq("l_orderkey"))
      .agg(count(lit(1)).as("dup_keys"),
        coalesce(sum(col("dup_count")), lit(0L)).as("dup_rows"))

  // ---------------------------------------------------------------- q08
  /** updateAllExistingItems with updateWithNullValues=false: matched
    * target rows take staged values, but nulls never overwrite
    * (per-column coalesce; reference DbImportWorker.java:535).
    */
  def q08UpdateAllJoin(s: SparkSession, d: String): DataFrame = {
    val staged = orders(s, d).groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_totalprice")).as("mx"))
      .select(col("c_custkey"),
        when(col("mx") < 150000.0, lit(null)).otherwise(col("mx")).as("c_acctbal"))
    Merge.updateAll(customer(s, d), staged, Seq(Key("c_custkey")), updateWithNull = false)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q09
  /** updateFirstExistingItems: only the first occurrence (by target
    * order) of a duplicated target key is updated
    * (reference DbImportWorker.java:518-526).
    */
  def q09UpdateFirst(s: SparkSession, d: String): DataFrame = {
    val staged = orders(s, d).groupBy(col("o_orderkey").as("l_orderkey"))
      .agg(max(col("o_totalprice")).as("l_quantity"))
    // Total target order (see q05) so "first occurrence" is well-defined;
    // the final sort uses only update-invariant columns.
    Merge.updateFirst(
        lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_quantity")),
        staged, Seq(Key("l_orderkey")),
        targetOrder = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice")))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
  }

  // ---------------------------------------------------------------- q10
  /** Full UPSERT pipeline (mode matrix of reference
    * DbImportWorker.java:537-578 with default UPDATE_ALL_JOIN and
    * updateWithNullValues=false): stage → join-duplicates → update-join →
    * anti-join insert.
    */
  def q10UpsertPipeline(s: SparkSession, d: String): DataFrame = {
    val source = orders(s, d).select(
      when(col("o_orderkey") % 10 === 0, col("o_custkey") + 2000000)
        .otherwise(col("o_custkey")).as("c_custkey"),
      when(col("o_orderstatus") === "F", lit(null))
        .otherwise(concat(lit("cust_"), col("o_orderpriority"))).as("c_name"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderkey").as("ord"))
    Merge.importMerge(
        target = customer(s, d), source = source, keys = Seq(Key("c_custkey")),
        mode = ImportMode.Upsert, dupMode = DuplicateMode.UpdateAllJoin,
        updateWithNull = false,
        sourceOrder = col("ord"), targetOrder = Seq(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q11
  /** INSERT mode with duplicate checks: in-source dedup keep-first, then
    * dropDuplicatesCrossTable (anti vs target), then append
    * (reference DbImportWorker.java:495-514).
    */
  def q11InsertPipeline(s: SparkSession, d: String): DataFrame = {
    val source = orders(s, d).select(
      (col("o_custkey") % 7000).as("c_custkey"),
      concat(lit("new_"), col("o_orderstatus")).as("c_name"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderkey").as("ord"))
    Merge.importMerge(
        target = customer(s, d), source = source, keys = Seq(Key("c_custkey")),
        mode = ImportMode.Insert, dupMode = DuplicateMode.UpdateFirstDrop,
        updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("c_custkey")))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"), col("c_name"))
  }

  // ---------------------------------------------------------------- q12
  /** Arrival ordinal (import_item) — the reference's load-bearing
    * "first occurrence" device (DbUtilities.addIndexedIntegerColumn,
    * DbImportWorker.java:465,992-997) as an explicit-order ordinal.
    */
  def q12ArrivalOrdinal(s: SparkSession, d: String): DataFrame =
    Ordinals.withOrderedOrdinal(
        orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        Seq(col("o_orderkey")))
      .orderBy(col("o_orderkey"))

  // ---------------------------------------------------------------- q13
  /** Decimal format-info transforms (`.` and `,` formats, reference
    * DbImportWorker.java:1145-1208): build locale-formatted strings from
    * part prices, parse them back; the oracle asserts exact round-trip.
    */
  def q13DecimalFormats(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Transforms
    val src = part(s, d).select(col("p_partkey"),
      format_number(col("p_retailprice"), 2).as("dot_str"))
      .withColumn("comma_str", translate(col("dot_str"), ",.", ".,"))
    src.select(col("p_partkey"),
        Transforms.parseDecimalDot(col("dot_str")).as("parsed_dot"),
        Transforms.parseDecimalComma(col("comma_str")).as("parsed_comma"))
      .orderBy(col("p_partkey"))
  }

  // ---------------------------------------------------------------- q14
  /** Case folding + email normalize/validate format infos (reference
    * DbImportWorker.java:1316-1342).
    */
  def q14CaseEmail(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Transforms
    val raw = concat(lit("User."), col("c_custkey"),
      when(col("c_custkey") % 5 === 0, lit(".Example.COM  ")).otherwise(lit("@Example.COM  ")))
    customer(s, d).select(col("c_custkey"),
        Transforms.emailNormalize(raw).as("email_clean"),
        Transforms.emailValid(raw).as("email_valid"),
        Transforms.lowerCase(col("c_mktsegment")).as("seg_lc"),
        Transforms.upperCase(col("c_name")).as("name_uc"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q15
  /** Date/datetime pattern parse with the reference's fallback chain
    * (5-stage coalesce, DbImportWorker.java:1372-1483) + fixed-offset
    * import-TZ → db-TZ shift (`-idtz`/`-dbtz`,
    * DbImportWorker.java:1347-1349).
    */
  def q15DateChain(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Transforms
    val str = when(col("o_custkey") % 3 === 0, date_format(col("o_orderdate"), "dd.MM.yyyy HH:mm:ss"))
      .when(col("o_custkey") % 3 === 1, date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(date_format(col("o_orderdate"), "yyyy/MM/dd HH:mm:ss"))
    val parsed = Transforms.parseTimestampChain(col("date_str"),
      Seq("dd.MM.yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd HH:mm:ss"))
    orders(s, d).withColumn("date_str", str)
      .select(col("o_orderkey"), parsed.as("parsed_ts"),
        Transforms.shiftTimezone(parsed, "+02:00", "UTC").as("shifted_ts"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------------------------- q16
  /** Boolean interpretation, integer coercion, null-token and
    * non-null-String repair (reference DbImportWorker.java:1488-1566,
    * 1124-1136; CsvDataProvider.java:211-213).
    */
  def q16Coercions(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Transforms
    val boolStr = when(col("c_custkey") % 4 === 0, lit("true"))
      .when(col("c_custkey") % 4 === 1, lit("False"))
      .when(col("c_custkey") % 4 === 2, lit("1"))
      .otherwise(lit("no"))
    val intStr = when(col("c_custkey") % 3 === 0, lit("true"))
      .when(col("c_custkey") % 3 === 1, concat(col("c_custkey"), lit(".0")))
      .otherwise(col("c_custkey").cast("string"))
    val tokenStr = when(col("c_custkey") % 7 === 0, lit("NULL")).otherwise(col("c_mktsegment"))
    customer(s, d).select(col("c_custkey"),
        Transforms.interpretBool(boolStr).as("bool_val"),
        Transforms.coerceInt(intStr).as("int_val"),
        Transforms.nullToken(tokenStr, "NULL").as("segment_or_null"),
        Transforms.notNullStringRepair(Transforms.nullToken(tokenStr, "NULL")).as("segment_repaired"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q17
  /** Base64 → Blob format info (reference DbImportWorker.java:1484-1487):
    * encode document prefixes to base64, decode back to binary. The
    * oracle compares the HEX RENDERING of the round-tripped blob (the
    * driver's pandas compare cannot hash raw bytearrays); the byte-exact
    * binary round-trip itself is asserted in FunctionsSpec.
    */
  def q17Base64Blob(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Transforms
    documents(s, d).select(col("doc_id"),
        hex(Transforms.base64Blob(
          base64(substring(col("text"), 1, 64).cast("binary")))).as("blob_out"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q18
  /** Schema inference lattice (reference DataProvider.java:61-148) as one
    * distributed aggregation pass over stringified columns; the oracle
    * re-implements the same lattice in SQL.
    */
  def q18InferTypes(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d).select(
      col("o_orderkey").cast("string").as("c1"),
      col("o_totalprice").cast("string").as("c2"),
      date_format(col("o_orderdate"), "dd.MM.yyyy").as("c3"),
      when(col("o_orderstatus") === "F", lit("true")).otherwise(lit("false")).as("c4"),
      col("o_orderpriority").as("c5"),
      (col("o_orderkey") * 1000000000L).cast("string").as("c6"),
      date_format(col("o_orderdate"), "dd.MM.yyyy HH:mm:ss").as("c7"))
    graft.schema.TypeLattice.infer(src).orderBy(col("column_name"))
  }

  // ------------------------------------------------------ LLM pipeline

  /** Dedup test corpus: the documents plus exact copies (doc_id+1000000,
    * every 5th doc) and near-dup mutations (doc_id+2000000, every 7th doc
    * with the first 3 words dropped) — guarantees non-trivial dedup
    * output and is reproducible in SQL.
    */
  private def dedupCorpus(s: SparkSession, d: String): DataFrame = {
    // documents.parquet is a single small file → ONE input split; the
    // md5/shingle pipelines are CPU-bound, so spread rows across all
    // cores (on a real corpus the file splits provide this for free)
    val docs = documents(s, d).select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
    docs
      .unionAll(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionAll(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          regexp_replace(col("text"), "^(\\S+\\s+){3}", "").as("text")))
  }

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

  // ---------------------------------------------------------------- q22
  /** Exact dedup: hash-groupBy on the content fingerprint. */
  def q22ExactDedup(s: SparkSession, d: String): DataFrame =
    operators.TextDedup.exactDedup(dedupCorpus(s, d), "doc_id", "text")
      .select(col("keep_id"), col("group_size"), col("fp"))
      .orderBy(col("keep_id"))

  // ---------------------------------------------------------------- q23
  /** MinHash+LSH near-dup detection: shingle → signature → band buckets →
    * candidate join → exact-Jaccard verification.
    */
  def q23MinhashLsh(s: SparkSession, d: String): DataFrame =
    operators.TextDedup.verifiedNearDupPairs(dedupCorpus(s, d), "doc_id", "text",
        k = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id1"), col("id2"))

  // ---------------------------------------------------------------- q24
  /** CONTENT-ADDRESSED parquet artifact store for pipeline intermediates
    * shared by several queries ([[operators.Staging.Artifact]] pattern):
    * whichever consumer runs first pays the generation pass, everyone
    * else — including LATER SESSIONS — reads parquet.
    *
    * Addressing: an artifact lives at
    * `<cacheRoot>/<md5(sf-dir inputs)>/<name>-v<builderVersion(name)>`
    * where the input key hashes every input parquet file's
    * (name, size, mtime) and the builder version is PER ARTIFACT
    * ([[BuilderVersions]]): editing one builder re-keys exactly that
    * artifact — the other entries stay warm (spec-pinned; a GLOBAL
    * version would silently rebuild all four on any operator edit).
    * A changed corpus or changed builder code therefore changes the
    * address — the stale artifact is simply never addressed again
    * (invalidation by construction); a back-to-back rerun on the same
    * corpus re-reads day-1 artifacts at ~0 cost — the
    * incremental-pipeline shape a 100 TB curation run needs (day-2
    * dedup must not rebuild day-1 pairs).
    *
    * Lifecycle: cached artifacts are durable by default (reuse across
    * sessions is the point); `GRAFT_ARTIFACT_CLEANUP=1` opts INTO
    * deleting this JVM's cache root at shutdown (the old
    * always-delete behavior). Completeness is judged by parquet's
    * `_SUCCESS` marker; builds write to a temp sibling and move into
    * place atomically, so a crashed build can never be mistaken for a
    * finished artifact. Setting `GRAFT_ARTIFACT_CACHE` (env) or
    * `graft.artifact.cache` (sys-prop, spec hook) relocates the root;
    * a real 100 TB run points it at durable shared storage.
    */
  private[graft] object SessionArtifacts {
    /** Per-artifact builder versions: bump an entry when THAT builder's
      * semantics change — only its artifact re-keys; the rest stay
      * warm. (History: every builder was last touched at or before the
      * round-9 `knnEdgesLsh` hot-bucket cap; the r10 schema switch
      * itself re-keys everything once via the new directory layout.)
      */
    val BuilderVersions: Map[String, String] = Map(
      "pairs" -> "r9-1", "labels" -> "r9-1",
      "epairs" -> "r9-1", "edges" -> "r9-1").withDefaultValue("r10-1")
    /** Effective version — `graft.artifact.version.<name>` (sys-prop)
      * overrides for specs that pin the one-artifact-rebuild contract.
      */
    def builderVersion(name: String): String =
      sys.props.getOrElse(s"graft.artifact.version.$name",
        BuilderVersions(name))
    private val buildLock = new Object
    private def rmTree(p: String): Unit = {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val root = Paths.get(p)
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    }
    def cacheRoot: String =
      sys.props.get("graft.artifact.cache")
        .orElse(sys.env.get("GRAFT_ARTIFACT_CACHE"))
        .getOrElse(sys.props("java.io.tmpdir") + "/graft-artifact-cache")
    if (sys.env.get("GRAFT_ARTIFACT_CLEANUP").contains("1"))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        scala.util.Try(rmTree(cacheRoot))))
    /** md5 over the sf dir's input parquet stats (inputs ONLY — builder
      * versions live in the per-artifact directory name): coarse (ANY
      * table change re-keys every artifact) but exactly as strong as
      * the invalidation contract needs — false rebuilds cost one
      * generation pass; a false HIT would be silent wrong data.
      */
    def contentKey(d: String): String = {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val dir = Paths.get(d)
      val stats =
        if (!Files.isDirectory(dir)) s"missing:$d"
        else {
          val ls = Files.list(dir)
          try ls.iterator().asScala.toSeq
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .sortBy(_.getFileName.toString)
            .map(p => s"${p.getFileName}:${Files.size(p)}:" +
              s"${Files.getLastModifiedTime(p).toMillis}")
            .mkString("|")
          finally ls.close()
        }
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d|$stats".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    }
    def getOrBuild(name: String, s: SparkSession, d: String)
                  (build: => DataFrame): DataFrame = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val dir = Paths.get(cacheRoot, contentKey(d),
        s"$name-v${builderVersion(name)}")
      if (!Files.exists(dir.resolve("_SUCCESS"))) buildLock.synchronized {
        if (!Files.exists(dir.resolve("_SUCCESS"))) {
          Files.createDirectories(dir.getParent)
          val tmp = dir.getParent.resolve(s".tmp_${name}_${System.nanoTime()}")
          build.write.mode("overwrite").parquet(tmp.toString)
          try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
          catch { // lost a cross-JVM race: the winner's artifact is equivalent
            case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.FileSystemException
              if Files.exists(dir.resolve("_SUCCESS")) => rmTree(tmp.toString)
          }
        }
      }
      s.read.parquet(dir.toString)
    }
  }

  /** One PPJoin pass shared by q24 (pairs), q67/q104/q113 (via labels),
    * and q126: the verified pair set is computed once per
    * (session, sf-dir); the other consumers read the artifact instead of
    * re-running shingle → prefix → verify over the corpus. At pipeline
    * scale this is the difference between one PPJoin pass and N.
    */
  private def dedupPairs(s: SparkSession, d: String): DataFrame =
    SessionArtifacts.getOrBuild("pairs", s, d) {
      operators.TextDedup.jaccardPairsPrefix(dedupCorpus(s, d), "doc_id", "text",
        k = 3, threshold = 0.6)
    }

  /** Connected-components labels over [[dedupPairs]], memoized the same
    * way: q67 (clusters) and q104 (canonical election) consume the SAME
    * label set, so the O(log n)-round iteration runs once per
    * (session, sf-dir) and lands in a parquet artifact.
    */
  private def dedupLabels(s: SparkSession, d: String): DataFrame =
    SessionArtifacts.getOrBuild("labels", s, d) {
      operators.ConnectedComponents.labels(dedupPairs(s, d), "id1", "id2")
    }

  /** Exact n-gram Jaccard pairs via PPJoin-style prefix filtering
    * ([[operators.TextDedup.jaccardPairsPrefix]]) — result-identical to
    * the direct shingle join (spec-pinned), but candidate enumeration is
    * bounded by prefix collisions instead of every co-shingled pair, so
    * it survives hot-shingle corpora at scale.
    */
  def q24NgramJaccard(s: SparkSession, d: String): DataFrame =
    dedupPairs(s, d)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id1"), col("id2"))

  // ---------------------------------------------------------------- q25
  /** 32-bit SimHash sketch per document. */
  def q25Simhash(s: SparkSession, d: String): DataFrame =
    dedupCorpus(s, d).select(col("doc_id"),
        operators.TextDedup.simhash32(col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q26
  /** Brute-force cosine top-k ANN baseline (broadcast queries, no corpus
    * shuffle).
    */
  def q26AnnTopK(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val corpus = e.filter(col("vec_id") >= 10)
    operators.Similarity.bruteForceTopK(queries, corpus, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q27
  /** IVF-style ANN (coarse centroids + nprobe buckets) — the scale path.
    * Not SQL-expressible compactly; driver records a rows-only check.
    */
  def q27AnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val corpus = e.filter(col("vec_id") >= 10)
    operators.Similarity.ivfTopK(queries, corpus, k = 5, nprobe = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q28
  /** Embedding-cosine near-duplicates via hyperplane-LSH sub-buckets
    * inside the coarse (label) buckets, verified with exact cosine
    * (approximate recall, exact precision). The corpus is augmented with
    * exact copies so duplicates exist; copies agree on every sign bit, so
    * LSH recall on them is 1. The all-pairs-in-bucket tier
    * ([[operators.Similarity.nearDupPairs]]) remains the ground truth in
    * the spec suite.
    */
  def q28EmbeddingNearDup(s: SparkSession, d: String): DataFrame =
    embedPairs(s, d).orderBy(col("id1"), col("id2"))

  /** q28/q97 share one LSH pair-generation pass — the embedding analog
    * of [[dedupPairs]]: the verified pair set is computed once per
    * (session, sf-dir) and materialized as a parquet artifact; the
    * second consumer reads the artifact instead of re-hashing and
    * re-verifying the corpus.
    */
  private def embedPairs(s: SparkSession, d: String): DataFrame =
    SessionArtifacts.getOrBuild("epairs", s, d) {
      val e = embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"))
        .repartition(s.sparkContext.defaultParallelism)
      val corpus = e.unionAll(e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("label"), col("embedding")))
      operators.Similarity.nearDupPairsLsh(corpus, threshold = 0.99)
    }

  /** One co-purchase pair build shared by q83 (PageRank), q119
    * (triangles), and q128 (association rules): the distinct
    * (order, part) self-join — the expensive O(Σ basket²) pass — is
    * grouped to `(pa, pb, n_both)` with `pa < pb` once per
    * (session, sf-dir). q128 reads the support counts directly; the
    * graph queries project the unique undirected pair set (PageRank
    * mirrors it into both orientations — identical to its internal
    * DISTINCT of the raw directed join).
    */
  private def copurchasePairs(s: SparkSession, d: String): DataFrame =
    SessionArtifacts.getOrBuild("edges", s, d) {
      val li = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("n_both"))
    }

  // ---------------------------------------------------------------- q29
  /** Multimodal binary-column plumbing: opaque payloads + typed metadata
    * extracted scan-side (decode itself is the stubbed mapPartitions path,
    * exercised in the test suite).
    */
  def q29MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val media = documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio")).otherwise(lit("video"))
        .as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
    operators.Multimodal.withBinaryMeta(media, "payload")
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("header_hex"), col("content_md5"))
      .orderBy(col("doc_id"))
  }

  // ----------------------------------------------------- source round-trips

  /** Nation rendered as `n_nationkey;n_name;n_regionkey` CSV lines
    * (driver-side, 25 rows — a fixture generator, not a data path).
    */
  private def nationCsv(s: SparkSession, d: String): String = {
    val rows = nation(s, d).orderBy(col("n_nationkey")).collect()
    val body = rows.map(r => s"${r.getInt(0)};${r.getString(1)};${r.getInt(2)}")
    ("n_nationkey;n_name;n_regionkey" +: body).mkString("\n")
  }

  private def castNation(df: DataFrame): DataFrame =
    df.select(col("n_nationkey").cast("int"), col("n_name").cast("string"),
        col("n_regionkey").cast("int"))
      .orderBy(col("n_nationkey"))

  // ---------------------------------------------------------------- q62
  /** REAL image decode end-to-end: deterministic solid-color PNGs are
    * synthesized from part keys (lossless encode), decoded back through
    * the JDK ImageIO pipeline ([[operators.Multimodal.imageFeatures]]),
    * and the recovered dimensions + channel means are checked against an
    * oracle that predicts them analytically from the same key formula —
    * proving the binary column plumbing carries real media, not just
    * metadata.
    */
  def q62ImageDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = part(s, d).select(col("p_partkey"))
      .filter(col("p_partkey") % 7 === 0)
      .as[Long].map { k =>
        Multimodal.MediaRecord(k, "image", Multimodal.solidPng(
          w = (8 + k % 24).toInt, h = (8 + k % 17).toInt,
          r = (k % 256).toInt, g = (k * 7 % 256).toInt, b = (k * 13 % 256).toInt))
      }
    Multimodal.imageFeatures(recs).toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("media_id"))
  }

  // ---------------------------------------------------------------- q30
  /** CSV source round-trip: write nation as `;`-separated CSV with the
    * reference dialect, read it back through [[sources.CsvSource]] and
    * cast via the mapping (SURVEY §2.1 CSV scan).
    */
  def q30SrcCsv(s: SparkSession, d: String): DataFrame = {
    import sources._
    val f = SyntheticFixtures.dir("csv")
    SyntheticFixtures.writeText(new java.io.File(f, "nation.csv"), nationCsv(s, d))
    castNation(CsvSource.read(s, new java.io.File(f, "nation.csv").getPath))
  }

  // ---------------------------------------------------------------- q31
  /** JSON source round-trip (JSON-lines, the scalable layout): write an
    * orders subset, read back via [[sources.JsonSource.readLines]]
    * (SURVEY §2.1 JSON scan).
    */
  def q31SrcJson(s: SparkSession, d: String): DataFrame = {
    val f = new java.io.File(sources.SyntheticFixtures.dir("json"), "orders")
    orders(s, d).filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
      .write.mode("overwrite").json(f.getPath)
    sources.JsonSource.readLines(s, f.getPath)
      .select(col("o_orderkey").cast("long"), col("o_orderstatus").cast("string"),
        col("o_totalprice").cast("double"), col("o_orderdate").cast("timestamp"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------------------------- q32
  /** XML source round-trip: `<Entries><Entry><col>v</col>…` generated
    * from region, parsed back by the streaming StAX reader
    * (SURVEY §2.1 XML scan).
    */
  def q32SrcXml(s: SparkSession, d: String): DataFrame = {
    val rows = region(s, d).orderBy(col("r_regionkey")).collect()
    val xml = rows.map { r =>
      s"  <Entry>\n    <r_regionkey>${r.getInt(0)}</r_regionkey>\n" +
        s"    <r_name>${r.getString(1)}</r_name>\n  </Entry>"
    }.mkString("<Entries>\n", "\n", "\n</Entries>")
    val f = new java.io.File(sources.SyntheticFixtures.dir("xml"), "region.xml")
    sources.SyntheticFixtures.writeText(f, xml)
    sources.XmlSource.read(s, f.getPath)
      .select(col("r_regionkey").cast("int"), col("r_name").cast("string"))
      .orderBy(col("r_regionkey"))
  }

  // ---------------------------------------------------------------- q33
  /** YAML source round-trip: nation as a YAML sequence of flat mappings,
    * parsed by SnakeYAML inside tasks (SURVEY §2.1 YAML scan).
    */
  def q33SrcYaml(s: SparkSession, d: String): DataFrame = {
    val rows = nation(s, d).orderBy(col("n_nationkey")).collect()
    val yaml = rows.map { r =>
      s"- n_nationkey: ${r.getInt(0)}\n  n_name: \"${r.getString(1)}\"\n  n_regionkey: ${r.getInt(2)}"
    }.mkString("\n")
    val f = new java.io.File(sources.SyntheticFixtures.dir("yaml"), "nation.yaml")
    sources.SyntheticFixtures.writeText(f, yaml)
    castNation(sources.YamlSource.read(s, f.getPath))
  }

  // ---------------------------------------------------------------- q34
  /** vCard source round-trip: cards generated from customers, flattened
    * back to firstname/lastname/formatted_name/phone columns
    * (SURVEY §2.1 vCard scan).
    */
  def q34SrcVcf(s: SparkSession, d: String): DataFrame = {
    val ks = customer(s, d).filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey")).orderBy(col("c_custkey")).collect().map(_.getLong(0))
    val vcf = ks.map { k =>
      s"BEGIN:VCARD\nVERSION:2.1\nN:Cust$k;First$k;;;\nFN:First$k Cust$k\nTEL;CELL:+490000$k\nEND:VCARD"
    }.mkString("\n")
    val f = new java.io.File(sources.SyntheticFixtures.dir("vcf"), "customers.vcf")
    sources.SyntheticFixtures.writeText(f, vcf)
    sources.VcfSource.read(s, f.getPath)
      .select(col("firstname"), col("lastname"), col("formatted_name"),
        col("phone_1"), col("phone_1_attr"))
      .orderBy(col("lastname"))
  }

  // ---------------------------------------------------------------- q35
  /** Compression layer: the same nation CSV read through gz, tar.gz,
    * plain zip and ZipCrypto-password zip containers
    * (SURVEY §2.1 compression; password fixture analog of
    * `Test_ZipCrypto_Password_abc123.csv.zip`).
    */
  def q35SrcCompressed(s: SparkSession, d: String): DataFrame = {
    import sources._
    import s.implicits._
    val csv = nationCsv(s, d)
    val base = SyntheticFixtures.dir("compressed")
    SyntheticFixtures.writeGz(new java.io.File(base, "nation_gz.csv.gz"), csv)
    SyntheticFixtures.writeZip(new java.io.File(base, "nation_zip.csv.zip"), "nation.csv", csv)
    SyntheticFixtures.writeTarGz(new java.io.File(base, "nation_tgz.csv.tar.gz"), "nation.csv", csv)
    SyntheticFixtures.writeZipCrypto(
      new java.io.File(base, "nation_pwzip.csv.zip"), "nation.csv", csv, "abc123")
    SyntheticFixtures.writeZipAes256(
      new java.io.File(base, "nation_aeszip.csv.zip"), "nation.csv", csv, "abc123")
    def readVariant(file: String, variant: String, pw: Option[String]): DataFrame = {
      val content = Compression.readWholeText(s, new java.io.File(base, file).getPath, pw)
        .map(_._2)
      val lines = content.flatMap(_.split("\n").toSeq)
      CsvSource.readLines(lines).withColumn("variant", lit(variant))
    }
    readVariant("nation_aeszip.csv.zip", "aeszip", Some("abc123"))
      .unionAll(readVariant("nation_gz.csv.gz", "gz", None))
      .unionAll(readVariant("nation_pwzip.csv.zip", "pwzip", Some("abc123")))
      .unionAll(readVariant("nation_tgz.csv.tar.gz", "tgz", None))
      .unionAll(readVariant("nation_zip.csv.zip", "zip", None))
      .select(col("variant"), col("n_nationkey").cast("int"),
        col("n_name").cast("string"), col("n_regionkey").cast("int"))
      .orderBy(col("variant"), col("n_nationkey"))
  }

  // ---------------------------------------------------------------- q36
  /** Table-name-from-file-name derivation for multi-file `-table '*'`
    * imports (reference DbImport.java:1316-1340, pinned by its unit
    * test): names flow through [[sources.TableNames.deriveTableName]].
    */
  def q36TableNames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = nation(s, d).select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey")).collect()
      .map { r =>
        val fileName = s"import_${r.getString(1)}(${r.getString(1).toLowerCase}).csv.gz"
        (r.getInt(0), sources.TableNames.deriveTableName(fileName))
      }
    s.createDataset(rows.toIndexedSeq).toDF("n_nationkey", "table_name")
      .orderBy(col("n_nationkey"))
  }

  // ---------------------------------------------------------------- q37
  /** Event-time tumbling-window aggregation — the batch face of the
    * Structured-Streaming surface (the streaming variant with watermarks
    * runs in StreamingSpec over the same logic). `ts` arrives as raw
    * nanos (see Tables) and buckets to epoch-aligned hours.
    */
  def q37EventWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts_utc"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  // ---------------------------------------------------------------- q43
  /** Per-user session windows (30-minute inactivity gap) over the event
    * stream — Spark's `session_window` evaluated in batch; the same
    * expression runs under Structured Streaming with a watermark
    * ([[streaming.StreamingImport.sessionEventStats]]). A new session
    * starts when an event arrives ≥ gap after the previous one; the
    * oracle is the classic gaps-and-islands formulation.
    */
  def q43SessionWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(session_window(col("ts_utc"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"),
        col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  // ---------------------------------------------------------------- q46
  /** Bloom-probed existence check: customers with no orders via
    * [[operators.BloomProbe.antiJoinWithBloom]] — rows the target-key
    * Bloom filter proves absent skip the join shuffle; "maybe" rows get
    * the exact anti-join. Oracle = the plain NOT EXISTS (the probe must
    * be result-invisible).
    */
  def q46BloomAnti(s: SparkSession, d: String): DataFrame =
    operators.BloomProbe.antiJoinWithBloom(
        customer(s, d).select(col("c_custkey"), col("c_name")),
        orders(s, d).filter(col("o_orderdate") >= lit("1998-01-01"))
          .select(col("o_custkey").as("c_custkey")),
        keys = Seq("c_custkey"), expectedKeys = 200000L)
      .orderBy(col("c_custkey"))

  // ---------------------------------------------------------------- q50
  /** Set operations (SURVEY §2.6): INTERSECT and EXCEPT between the
    * customer key sets ordering in 1995 vs 1996, unioned with a tag —
    * Spark plans both as aggregated joins (no distinct-on-driver).
    */
  def q50SetOps(s: SparkSession, d: String): DataFrame = {
    def orderers(year: Int) =
      orders(s, d)
        .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01"))
        .select(col("o_custkey").as("c_custkey")).distinct()
    val a = orderers(1995)
    val b = orderers(1996)
    a.intersect(b).withColumn("op", lit("both_years"))
      .unionByName(a.except(b).withColumn("op", lit("only_1995")))
      .select(col("op"), col("c_custkey"))
      .orderBy(col("op"), col("c_custkey"))
  }

  // ---------------------------------------------------------------- q51
  /** Group-wise top-k (top-3 orders by price per priority class): a
    * rank-over-partition window. The partition count bounds parallelism,
    * but each partition streams — no per-group materialization, and at
    * scale the window shuffle is the only exchange.
    */
  def q51GroupTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  // ---------------------------------------------------------------- q52
  /** Per-user event-stream analytics: lag, running sum, and a 3-row
    * moving sum in one window pass (single shuffle on user_id; all three
    * frames share the sort).
    */
  def q52WindowAnalytics(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_utc"), col("event_id"))
    events(s, d)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("running_sum",
        sum(col("value").cast("decimal(18,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("moving3_sum",
        sum(col("value").cast("decimal(18,6)"))
          .over(w.rowsBetween(-2, Window.currentRow)).cast("double"))
      .select(col("user_id"), col("event_id"), col("ts_utc"), col("value"),
        col("prev_value"), col("running_sum"), col("moving3_sum"))
      .orderBy(col("user_id"), col("ts_utc"), col("event_id"))
  }

  // ---------------------------------------------------------------- q53
  /** Pivot (revenue by nation × order status) with an explicit value
    * list — fixed output schema, so the plan is a single hash aggregate
    * (no values-discovery pre-pass, which at scale would be an extra
    * full scan).
    */
  def q53Pivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .orderBy(col("n_name"))

  // ---------------------------------------------------------------- q54
  /** Fixed-width histogram of order totals (bucket = floor(price/50k)) —
    * bucketing is a scan-stage expression, so the whole histogram is one
    * partial+final aggregate, no window, no second scan for bounds.
    */
  def q54Histogram(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / lit(50000.0)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("bucket"))

  // ---------------------------------------------------------------- q55
  /** Decile segmentation of customers by account balance + per-decile
    * stats. `ntile(10) OVER (ORDER BY …)` would collapse to a single
    * window partition; instead the bucket is re-derived from a
    * DISTRIBUTED ordered ordinal ([[Ordinals.withOrderedOrdinal]]: range
    * sort + per-partition offsets) using the SQL-standard ntile rule —
    * with N rows and k buckets the first N mod k buckets get one extra
    * row — so the result is bit-identical to the window form while every
    * stage stays parallel.
    */
  def q55Ntile(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    val ord = Ordinals.withOrderedOrdinal(base,
      Seq(col("c_acctbal"), col("c_custkey")), "__ord")
    val n = base.agg(count(lit(1)).as("__n"))
    ord.crossJoin(broadcast(n))
      // SQL ntile: s = N div k rows per bucket, first r = N mod k
      // buckets take s+1
      .withColumn("decile",
        expr("""CASE WHEN (__ord - 1) < (__n % 10) * (__n DIV 10 + 1)
               |  THEN (__ord - 1) DIV (__n DIV 10 + 1) + 1
               |  ELSE (__n % 10) + ((__ord - 1) - (__n % 10) * (__n DIV 10 + 1))
               |         DIV greatest(__n DIV 10, 1) + 1
               |END""".stripMargin).cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        (sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_bal"))
      .orderBy(col("decile"))
  }

  // ---------------------------------------------------------------- q63
  /** Pearson correlation per customer segment from EXACT decimal moment
    * sums (n, Σx, Σy, Σx², Σy², Σxy) — the one-pass, mergeable,
    * map-side-combinable formulation. The final arithmetic runs in
    * double on both engines over identical exact inputs, so the result
    * is bit-identical — unlike `corr()`, whose streaming update order is
    * engine-internal.
    */
  def q63Correlation(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(18,2)"
    val j = orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        col("o_totalprice").cast(dec).as("x"), col("c_acctbal").cast(dec).as("y"))
    val m = j.groupBy(col("c_mktsegment")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      sum(col("x") * col("y")).cast("double").as("sxy"))
    val nD = col("n").cast("double")
    // rounded output: the scale-4 moment sums exceed 2^53, so the
    // decimal->double CAST itself rounds — engines agree to ~12
    // significant digits, not bit-exactly
    m.select(col("c_mktsegment"), col("n"),
        round((nD * col("sxy") - col("sx") * col("sy")) /
          (sqrt(nD * col("sxx") - col("sx") * col("sx")) *
           sqrt(nD * col("syy") - col("sy") * col("sy"))), 6).as("corr_price_bal"),
        (col("sx") / nD).as("avg_price"))
      .orderBy(col("c_mktsegment"))
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

  // ---------------------------------------------------------------- q66
  /** REAL audio decode end-to-end (PCM WAV via the JDK's javax.sound):
    * deterministic square-wave fixtures synthesized from supplier keys
    * round-trip through encode → binary column → decode; recovered
    * format and RMS check against an oracle predicting them analytically
    * (square wave ⇒ RMS == amplitude, exactly, in raw sample units).
    */
  def q66AudioDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = supplier(s, d).select(col("s_suppkey"))
      .filter(col("s_suppkey") % 3 === 0)
      .as[Long].map { k =>
        Multimodal.MediaRecord(k, "audio", Multimodal.squareWav(
          sampleRate = 8000, amplitude = (1000 + k * 31 % 20000).toInt,
          nSamples = (4000 + k % 50 * 100).toInt))
      }
    Multimodal.audioFeatures(recs).toDF()
      .select(col("media_id"), col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"), col("n_samples"),
        col("rms"))
      .orderBy(col("media_id"))
  }

  // ---------------------------------------------------------------- q94
  /** REAL video frame sampling: uncompressed AVIs (one per selected
    * supplier, solid BI_RGB frames whose colors are a fixed function of
    * (media_id, frame_idx)) are decoded by the RIFF walker
    * ([[operators.Multimodal.decodeVideoFrames]]) and every 2nd frame's
    * exact channel means emitted. Lossless frames ⇒ the oracle predicts
    * decode output analytically (the video analog of q66's square-wave
    * RMS). Decode is partition-preserving `mapPartitions` — each task
    * decodes its own payloads, nothing centralizes.
    */
  def q94VideoFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = supplier(s, d).select(col("s_suppkey"))
      .filter(col("s_suppkey") % 4 === 0)
      .as[Long].map { k =>
        val n = (6 + k % 5).toInt
        val colors = (0 until n).map { f =>
          (((k * 37 + f * 11) % 256).toInt, ((k * 53 + f * 23) % 256).toInt,
            ((k * 71 + f * 5) % 256).toInt)
        }
        Multimodal.MediaRecord(k, "video",
          Multimodal.solidAvi(32 + (k % 3).toInt * 16, 24, fps = 10, colors))
      }
    Multimodal.videoFrameFeatures(recs, stride = 2).toDF()
      .select(col("media_id"), col("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  // ---------------------------------------------------------------- q65
  /** Incremental near-dup: the corpus LSH index is WRITTEN ONCE
    * ([[operators.TextDedup.writeLshIndex]] — at scale a standing
    * artifact), then a new ingest batch (the drop-first-3-words mutants)
    * probes it with its band keys broadcast — the corpus is scanned,
    * never re-hashed and never shuffled. Same banding/verify math as
    * q23, so the oracle recomputes both sides declaratively.
    */
  def q65IncrementalNearDup(s: SparkSession, d: String): DataFrame = {
    val idxPath = new java.io.File(sources.SyntheticFixtures.dir("lshindex"),
      "documents").getPath
    operators.TextDedup.writeLshIndex(documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", idxPath)
    val fresh = documents(s, d).filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        regexp_replace(col("text"), "^(\\S+\\s+){3}", "").as("text"))
    operators.TextDedup.probeLshIndex(fresh, "doc_id", "text", idxPath,
        threshold = 0.5)
      .select(col("new_id"), col("corpus_id"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  // ---------------------------------------------------------------- q67
  /** Dedup CLUSTERING — the step a real pipeline runs after pair
    * generation: exact-Jaccard near-dup pairs (the q24 PPJoin tier)
    * become undirected edges, and connected components labels every
    * clustered document with its duplicate cluster (minimum doc id in
    * the component) plus the cluster size. Components are the
    * alternating large-star/small-star rounds of
    * [[operators.ConnectedComponents]] — O(log n) rounds of hash
    * joins, no driver-side graph. The oracle rebuilds the same pair
    * set in SQL and closes it with a recursive CTE. Pairs come from the
    * shared per-session artifact ([[dedupPairs]]) — when q24 already
    * ran, this query costs connected components only, not a second
    * PPJoin pass.
    */
  def q67DedupClusters(s: SparkSession, d: String): DataFrame =
    operators.ConnectedComponents.clustersFromLabels(dedupLabels(s, d))
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
        col("cluster_size"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q68
  /** Benchmark decontamination: every corpus document scored by its
    * word-3-gram overlap with a small benchmark set (docs with
    * doc_id % 97 == 0 stand in for an eval suite). The benchmark's
    * distinct shingles BROADCAST ([[operators.Decontamination]]) — the
    * corpus is scanned once and never shuffled, which is the only shape
    * that works when the corpus is the 100 TB side. The planted exact
    * copies and drop-3-words mutants of benchmark docs must flag.
    */
  def q68Decontamination(s: SparkSession, d: String): DataFrame = {
    val bench = documents(s, d).filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    operators.Decontamination.contaminationStats(
        dedupCorpus(s, d), bench, "doc_id", "text", k = 3, threshold = 0.5)
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_matched"),
        col("contam_frac"), col("is_contaminated"))
      .orderBy(col("doc_id"))
  }

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

  // ---------------------------------------------------------------- q70
  /** Stratified deterministic sampling: rebalance the language mix by
    * downsampling the dominant language (en keeps 30%, the rest 90%)
    * with an md5-of-id permille bucket ([[operators.Sampling]]) — no
    * RNG, engine-invariant, scan-stage filter that pushes down.
    */
  def q70StratifiedSample(s: SparkSession, d: String): DataFrame =
    operators.Sampling.stratifiedHashSample(
        documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang", ratesPermille = Map("en" -> 300),
        defaultPermille = 900)
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q71
  /** Per-source quota cap: at most 8 documents per source (the
    * over-representation guard), deterministic by doc_id order. The
    * window is hash-partitioned per source — parallelism is the number
    * of sources, never a single partition.
    */
  def q71SourceQuota(s: SparkSession, d: String): DataFrame =
    operators.Sampling.groupQuotaCap(
        documents(s, d).select(col("doc_id"), col("source")),
        Seq("source"), Seq(col("doc_id")), maxPerGroup = 8)
      .select(col("doc_id"), col("source"), col("quota_rank"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q90
  /** Token-budget data mixture ([[operators.Sampling.tokenBudgetMix]]):
    * three sources blended 40/40/20 into a 2000-token budget, members
    * chosen by engine-invariant hash order. One distributed sort + a
    * per-partition-offset prefix sum — no per-source single-reducer
    * window, so the mixing step scales like a sort at corpus size.
    */
  def q90SourceMix(s: SparkSession, d: String): DataFrame =
    operators.Sampling.tokenBudgetMix(
        documents(s, d).select(col("doc_id"), col("source"),
          functions.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "source",
        "n_tokens", Map("src0" -> 0.4, "src1" -> 0.4, "src2" -> 0.2),
        totalTokens = 2000L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("tokens_before"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q72
  /** Exact repeated-substring spans (suffix-array-style dedup as a
    * distributed hash-groupBy, [[operators.SubstringDedup]]): every
    * 15-token span occurring twice anywhere in the corpus is flagged
    * and per-document coverage computed with exact interval merging.
    * The dedup corpus's verbatim copies guarantee duplicated spans.
    */
  def q72SubstringSpans(s: SparkSession, d: String): DataFrame =
    operators.SubstringDedup.duplicatedSpanStats(
        dedupCorpus(s, d), "doc_id", "text", w = 15)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q73
  /** Order-invariant per-group table checksum
    * ([[operators.TableChecksum]]): XOR + modular-sum of 48-bit row
    * hashes — verifies a 100 TB import against its source without
    * sorting or co-locating either side (commutative aggregates merge
    * across any partitioning).
    */
  def q73TableChecksum(s: SparkSession, d: String): DataFrame =
    operators.TableChecksum.checksum(lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus"),
        groupCols = Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q74
  /** CUBE grouping sets over customer segments × nations — all four
    * rollup combinations in ONE pass (Spark expands grouping sets
    * inside a single hash aggregate; no repeated scans).
    */
  def q74Cube(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("mktsegment"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))
      .orderBy(col("mktsegment"), col("nation"))

  // ---------------------------------------------------------------- q75
  /** Distribution ranks (percent_rank / cume_dist) of account balances
    * within each market segment — windows partitioned by segment, so
    * parallelism is the segment count and no global sort exists.
    */
  def q75DistributionRanks(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    customer(s, d).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .orderBy(col("c_custkey"))
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

  // ---------------------------------------------------------------- q78
  /** Int8-quantized ANN ([[operators.Quantization]]): per-dimension
    * min/max calibration → 0..255 integer vectors → top-5 by EXACT
    * integer dot product (engine-invariant, unlike float sums).
    * Queries broadcast; the corpus never shuffles.
    */
  def q78QuantizedAnn(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val calib = operators.Quantization.calibrate(e, "embedding")
    val q = operators.Quantization
      .quantize(e.filter(col("vec_id") < 10), "vec_id", "embedding", calib)
      .select(col("vec_id").as("query_id"), col("qvec").as("qv"))
    val c = operators.Quantization
      .quantize(e.filter(col("vec_id") >= 10), "vec_id", "embedding", calib)
    val scored = c.crossJoin(broadcast(q))
      .withColumn("qdot", operators.Quantization.qdot(col("qv"), col("qvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("qdot").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("qdot"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q79
  /** Keyed snapshot diff ([[operators.SnapshotDiff]]): classify rows
    * of a mutated orders snapshot as added / removed / changed via one
    * full-outer join on the key comparing engine-invariant row hashes.
    * The mutation is deterministic so the oracle reproduces it.
    */
  def q79SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val old = orders(s, d)
    val neu = old.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .unionAll(old.filter(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000000L))
    operators.SnapshotDiff.diff(old, neu, "o_orderkey",
        Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------------------------- q80
  /** Conversion funnel over the event stream: users whose first signup
    * is followed by >= 1 purchase within 7 days. All timestamp
    * arithmetic in integer microseconds (nanos DIV 1000) — exact and
    * engine-invariant. One shuffle keyed by user.
    */
  def q80Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      expr("ts DIV 1000").as("us"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("first_signup_us"))
    val sevenDaysUs = 7L * 86400L * 1000000L
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(signup, Seq("user_id"))
      .filter(col("us") > col("first_signup_us") &&
        col("us") <= col("first_signup_us") + sevenDaysUs)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purch_7d"))
    signup.join(purchases, Seq("user_id"), "left")
      .select(col("user_id"), col("first_signup_us"),
        coalesce(col("n_purch_7d"), lit(0L)).as("n_purch_7d"),
        (coalesce(col("n_purch_7d"), lit(0L)) > 0).cast("long").as("converted"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q81
  /** Incremental aggregate maintenance ([[operators.IncrementalAgg]]):
    * a standing per-customer aggregate state (90% of orders) is
    * refreshed by merging the delta batch's partials — base never
    * rescanned. Matches the full recompute exactly (decimal sums are
    * merge-order-invariant).
    */
  def q81IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).withColumn("price",
      col("o_totalprice").cast("decimal(18,2)"))
    val state = operators.IncrementalAgg.partials(
      o.filter(col("o_orderkey") % 10 =!= 0), Seq("o_custkey"), Seq("price"))
    val delta = operators.IncrementalAgg.partials(
      o.filter(col("o_orderkey") % 10 === 0), Seq("o_custkey"), Seq("price"))
    operators.IncrementalAgg.merge(state, delta, Seq("o_custkey"), Seq("price"))
      .select(col("o_custkey"), col("n").as("n_orders"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy(col("o_custkey"))
  }

  // ---------------------------------------------------------------- q82
  /** Semi-structured extraction: parse the events' JSON `props` column
    * in the scan stage (`get_json_object`, codegen'd — no UDF) and
    * aggregate the extracted field per event type.
    */
  def q82JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q83
  /** PageRank over the co-purchase part graph (parts sharing an order
    * are linked), 3 fixed iterations ([[operators.PageRank]]). Each
    * iteration is one join + one hash aggregation keyed by node; the
    * top-20 ranking is decided on the ROUNDED score so any engine
    * agrees on the boundary.
    */
  def q83PageRank(s: SparkSession, d: String): DataFrame = {
    // mirror the shared undirected pair artifact into both orientations:
    // the rows are unique (pa, pb) with pa < pb, so this IS the distinct
    // directed edge set the raw =!= self-join produced
    val p = copurchasePairs(s, d)
    val edges = p.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(p.select(col("pb").as("src"), col("pa").as("dst")))
    operators.PageRank.ranks(edges, "src", "dst", iters = 3)
      .withColumn("prr", round(col("pr"), 6))
      .orderBy(col("prr").desc, col("node"))
      .limit(20)
      .select(col("node").as("part"), col("prr").as("pr"))
  }

  // ---------------------------------------------------------------- q84
  /** Time-series regridding: per-user hourly grid from first to last
    * event, left-joined with actual activity, gaps forward-filled with
    * the last observed value (`last(..., ignoreNulls)` over a
    * user-partitioned window). Grid generation is `sequence` +
    * `explode` in the scan stage; all ts arithmetic in integer micros.
    */
  def q84ResampleFfill(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = events(s, d).filter(col("user_id") < 8)
      .select(col("user_id"), expr("ts DIV 1000").as("us"), col("value"))
      .withColumn("hour_us", (col("us") - (col("us") % hourUs)))
    val hourly = ev.groupBy(col("user_id"), col("hour_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(hourUs))).as("hour_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("hour_us"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hour_us"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("ffill_value",
        last(col("sum_value"), ignoreNulls = true).over(w).cast("double"))
      .select(col("user_id"), col("hour_us"), col("n_events"),
        col("ffill_value"))
      .orderBy(col("user_id"), col("hour_us"))
  }

  // ---------------------------------------------------------------- q85
  /** Table profiling ([[operators.TableProfile]]): per-column nulls,
    * exact distinct counts, min/max — the pre-import inspection pass.
    */
  def q85Profile(s: SparkSession, d: String): DataFrame =
    operators.TableProfile.profile(
        customer(s, d).withColumn("c_acctbal",
          col("c_acctbal").cast("decimal(18,2)")),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"))
      .orderBy(col("column_name"))

  // ---------------------------------------------------------------- q86
  /** CDC log application ([[operators.CdcApply]]): a synthesized I/U/D
    * change log over orders folds to final state in ONE max_by hash
    * aggregation (no window, no sort). The oracle states the expected
    * final table directly.
    */
  def q86CdcApply(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val log = o.select(col("o_orderkey"), lit("I").as("op"), lit(1L).as("ord"),
        col("o_orderstatus").as("status"), col("o_custkey"))
      .unionAll(o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("U").as("op"), lit(2L).as("ord"),
          lit("U").as("status"), col("o_custkey")))
      .unionAll(o.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("D").as("op"), lit(3L).as("ord"),
          lit(null).cast("string").as("status"), col("o_custkey")))
    operators.CdcApply.applyLog(log, "o_orderkey", "op", "ord",
        Seq("status", "o_custkey"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------------------------- q87
  /** Z-order locality audit ([[operators.ZOrder]]): Morton-interleave
    * (part, supplier) and bucket the code — each bucket bounds BOTH
    * dimensions, the property that makes parquet min/max stats prune
    * two-key filters after a Z-order write. Pure bit arithmetic.
    */
  def q87ZOrder(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select((col("l_partkey") % 1024).as("p"), (col("l_suppkey") % 1024).as("sk"))
      .withColumn("zbin",
        shiftright(operators.ZOrder.morton2(col("p"), col("sk")), 12))
      .groupBy(col("zbin"))
      .agg(count(lit(1)).as("n"), min(col("p")).as("min_p"),
        max(col("p")).as("max_p"), min(col("sk")).as("min_s"),
        max(col("sk")).as("max_s"))
      .orderBy(col("zbin"))

  // ---------------------------------------------------------------- q88
  /** Burst debounce: drop an event when the same (user, type) fired
    * within the preceding 2 hours — telemetry de-noising as a per-key
    * lag window (integer-μs arithmetic; total order via event_id
    * tie-break). Windows partition by key: no global sort.
    */
  def q88Debounce(s: SparkSession, d: String): DataFrame = {
    val gapUs = 2L * 3600L * 1000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNull || col("us") - col("prev_us") >= gapUs)
      .select(col("event_id"), col("user_id"), col("event_type"), col("us"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q89
  /** Trained coarse quantizer for ANN: spherical k-means
    * ([[operators.KMeans]], k=4, two Lloyd's iterations) over the
    * embeddings. Deterministic end to end — lowest-id seeding, argmax
    * cosine with lowest-cluster tie-break, DECIMAL-exact centroid means
    * — so the oracle replays both iterations in SQL exactly. Per
    * iteration the corpus is scanned once with the k centroids
    * broadcast; the update shuffle is k x dims rows per partition.
    * Centroids are rendered one row per dimension — (cluster_id,
    * n_points, dim, value) — so the oracle harness compares scalar
    * columns, never a raw array.
    */
  def q89Kmeans(s: SparkSession, d: String): DataFrame =
    operators.KMeans.fit(embeddings(s, d), "vec_id", "embedding",
        k = 4, iters = 2)
      .select(col("cluster_id"), col("n_points"),
        posexplode(col("centroid")).as(Seq("pos", "x")))
      .select(col("cluster_id"), col("n_points"),
        (col("pos") + 1).cast("long").as("dim"),
        round(col("x"), 6).as("value"))
      .orderBy(col("cluster_id"), col("dim"))

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

  // ---------------------------------------------------------------- q97
  /** SEMANTIC dedup clustering — the embedding analog of q67: hyperplane
    * -LSH near-dup pairs (the q28 scale tier, approximate recall / exact
    * -cosine precision) become undirected edges and connected components
    * labels every clustered vector with its duplicate cluster (minimum
    * vec_id) and cluster size. Same large-star/small-star rounds as the
    * text tier — O(log n) rounds of hash joins, no driver graph; the
    * oracle replays the LSH banding in SQL and closes the pairs with a
    * recursive CTE. Pairs come from the shared per-session artifact
    * ([[embedPairs]]) — when q28 already ran, this query costs
    * connected components only.
    */
  def q97EmbeddingClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = embedPairs(s, d)
    operators.ConnectedComponents.clusters(pairs, "id1", "id2")
      .select(col("id").as("vec_id"), col("cluster").as("cluster_id"),
        col("cluster_size"))
      .orderBy(col("vec_id"))
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

  // ---------------------------------------------------------------- q99
  /** PCA covariance over the embedding corpus — the oracle-expressible
    * face of [[operators.Pca]]: DECIMAL-exact moment sums make the
    * upper-triangle covariance engine-independent. The 100 TB path is
    * `Pca.moments` (ONE typed aggregation, d²-sized partials, no
    * explode/join) — spec-pinned equal to this declarative reference;
    * eigendecomposition + whitening are dimension-sized driver work,
    * spec-pinned on their invariants (IndexingSpec).
    */
  def q99PcaCovariance(s: SparkSession, d: String): DataFrame =
    operators.Pca.covarianceExact(
        embeddings(s, d).select(col("vec_id"), col("embedding")), "embedding")
      .orderBy(col("i"), col("j"))

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

  // ---------------------------------------------------------------- q101
  /** Pairwise source-vocabulary overlap (mirror/re-crawl detection
    * ahead of dedup): one distinct hash agg for the vocabulary, a
    * token-co-partitioned self-join for intersections (bounded by
    * #groups² rows per token), tiny cross-joined size pairs so
    * zero-overlap pairs surface ([[operators.CorpusOverlap]]).
    */
  def q101SourceOverlap(s: SparkSession, d: String): DataFrame =
    operators.CorpusOverlap.vocabularyOverlap(documents(s, d), "source", "text")
      .orderBy(col("g_a"), col("g_b"))

  // ---------------------------------------------------------------- q102
  /** Mutual-kNN clustering over the embedding corpus (SemDeDup-style
    * density grouping): an edge survives only if each endpoint ranks
    * the other in its own top-4, stripping hub vectors; connected
    * components label the mutual graph. The query runs the LSH
    * band-bucket tier — the 100 TB path: candidates are pairs sharing
    * any hyperplane band key, so the corpus is never crossed whole and
    * the oracle replays the same deterministic banding in SQL. The
    * exact n² tier remains the spec ground truth (GraphSpec pins
    * per-pair sim identity and the recall floor)
    * ([[operators.KnnGraph]]).
    */
  def q102MutualKnn(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    operators.KnnGraph.mutualClusters(
        operators.KnnGraph.knnEdgesLsh(e, "vec_id", "embedding", k = 4))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------- q103
  /** DSIR importance resampling: score every non-`src0` document under
    * target-vs-raw hashed n-gram models (target = the `src0` slice) and
    * keep the top quarter by exact DECIMAL log-weight. The hashed
    * feature space collapses to a 64-row broadcast table, so the whole
    * selection is scans + hash aggs + one broadcast join + one
    * distributed-sort rank — nothing corpus-sized shuffles
    * ([[operators.Dsir]]).
    */
  def q103Dsir(s: SparkSession, d: String): DataFrame =
    operators.Dsir.importanceResample(documents(s, d), "doc_id", "text",
        col("source") === "src0", numBuckets = 64, keepFrac = 0.25)
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q104
  /** Quality-canonical near-dup dedup: the q24/q67 pair set clustered,
    * but the survivor of each cluster is the HIGHEST-quality member
    * (ties → smallest id), not the minimum id — the right election when
    * duplicates differ (the corpus's planted mutants are 3-words-
    * truncated, so the untruncated original must win its cluster).
    * Third consumer of the shared PPJoin pair artifact: when q24/q67
    * already ran, this costs clustering + one broadcast join only
    * ([[operators.ConnectedComponents.keepBestRepresentatives]]).
    */
  def q104CanonicalDedup(s: SparkSession, d: String): DataFrame = {
    val corpus = dedupCorpus(s, d)
      .withColumn("quality", graft.functions.TextAnalysis.qualityScore(col("text")))
    operators.ConnectedComponents.keepBestFromLabels(
        corpus, "doc_id", "quality", dedupLabels(s, d))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q105
  /** Per-source distinct-vocabulary KMV sketch vs exact: the
    * deterministic, mergeable, SQL-auditable alternative to HLL++ for
    * 100 TB cardinality profiling ([[operators.Sketches]]). k = 64
    * bottom hashes per source; `est_distinct` lands within ~1/√k of
    * exact, and the row publishes both so the error is visible. The
    * bottom-k window plans as WindowGroupLimit — each partition prunes
    * to its local k before the exchange.
    */
  def q105KmvSketch(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val vals = documents(s, d).select(col("source"),
      explode(graft.functions.TextAnalysis.tokens(col("text"))).as("w"))
    val est = operators.Sketches.kmvEstimate(
      operators.Sketches.kmvSketch(vals, Seq("source"), "w", k), Seq("source"), k)
    val exact = vals.distinct().groupBy(col("source"))
      .agg(count(lit(1)).as("exact_distinct"))
    exact.join(est, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("n_kept"),
        col("kth_hash"), col("est_distinct"))
      .orderBy(col("source"))
  }

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

  // ---------------------------------------------------------------- q108
  /** LSH-tier recall report: MinHash-LSH banded near-dup pairs at
    * threshold 0.6 measured against the exact PPJoin tier on the same
    * corpus ([[operators.PairMetrics.confusion]]). The verify step
    * makes precision exactly 1 by construction — the row DEMONSTRATES
    * the tier contract (approximate recall, exact precision) and puts
    * a measured number on the recall the banding theory predicts
    * (`1-(1-j³)⁴` ≈ 0.62 at j = 0.6, →1 as j→1; the corpus is mostly
    * exact copies, so the aggregate lands high). Reuses the shared
    * PPJoin pair artifact for the exact side.
    */
  def q108LshRecall(s: SparkSession, d: String): DataFrame = {
    val approx = operators.TextDedup.verifiedNearDupPairs(dedupCorpus(s, d),
      "doc_id", "text", k = 3, numHashes = 12, bands = 4, threshold = 0.6)
    operators.PairMetrics.confusion(approx, dedupPairs(s, d))
  }

  // ---------------------------------------------------------------- q109
  /** Robust outlier screen: median/MAD per return flag over extended
    * price, counting rows beyond 3 MAD ([[operators.Outliers]]). The
    * medians are bit-equal to `percentile_cont` via the exact-quantiles
    * operator (two range-partitioned sorts), and the cutoff compares
    * unrounded doubles — the count is engine-exact.
    */
  def q109MadOutliers(s: SparkSession, d: String): DataFrame =
    operators.Outliers.madOutliers(lineitem(s, d), Seq("l_returnflag"),
        "l_extendedprice", cutoff = 3.0)
      .orderBy(col("l_returnflag"))

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

  // ---------------------------------------------------------------- q111
  /** Quality-weighted sampling without replacement: 100 documents drawn
    * with probability ∝ quality score via deterministic
    * Efraimidis–Spirakis priorities ([[operators.Sampling
    * .weightedPrioritySample]]) — the auditable alternative to
    * rand()-weighted sampling: any engine and any partitioning draws
    * the SAME sample. Weights clamp at 0.05 so all-punctuation docs
    * (quality 0) stay drawable.
    */
  def q111WeightedSample(s: SparkSession, d: String): DataFrame =
    operators.Sampling.weightedPrioritySample(
        documents(s, d).select(col("doc_id"),
          greatest(graft.functions.TextAnalysis.qualityScore(col("text")),
            lit(0.05)).as("weight")),
        "doc_id", "weight", k = 100)
      .select(col("doc_id"), round(col("weight"), 6).as("weight"),
        col("lkey"), col("sel_rank"), col("selected"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q112
  /** Per-user event-transition matrix (first-order Markov estimate):
    * adjacent (event_type → next event_type) counts under the total
    * per-user order (ts, event_id), with row-normalized transition
    * probabilities. The lag window is user-partitioned (hash
    * partitioning — never global); the matrix itself is
    * |event_types|²-sized, so the normalizing join broadcasts.
    */
  def q112EventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val trans = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type")).agg(sum(col("n")).as("__tot"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("prob"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // ---------------------------------------------------------------- q113
  /** Cross-source duplicate provenance: every verified near-dup pair
    * attributed to its (source, source) cell — which feeds mirror /
    * re-crawl diagnosis at the DOCUMENT level (q101 answers it at the
    * vocabulary level). Fourth consumer of the shared PPJoin pair
    * artifact; the source lookup is a join against the (doc_id, source)
    * projection, and the output is |sources|²-bounded.
    */
  def q113DupProvenance(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("doc_id").as("__base"),
      col("source"))
    val pairs = dedupPairs(s, d)
      .select((col("id1") % 1000000).as("__b1"), (col("id2") % 1000000).as("__b2"))
    pairs
      .join(src.select(col("__base").as("__b1"), col("source").as("__s1")), Seq("__b1"))
      .join(src.select(col("__base").as("__b2"), col("source").as("__s2")), Seq("__b2"))
      .select(least(col("__s1"), col("__s2")).as("src_a"),
        greatest(col("__s1"), col("__s2")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ---------------------------------------------------------------- q114
  /** Exponentially time-decayed engagement score per user: each event
    * contributes `value · round(exp(−Δdays/7), 6)` against the corpus's
    * latest timestamp — recency weighting with a one-week half-life-ish
    * decay, the standard freshness prior of feed/source ranking. The
    * anchor is the corpus max (a 1-row broadcast); decay factors round
    * to 6dp and multiply DECIMAL(18,2)-cast values, so the per-user
    * DECIMAL sums are exact and engine-independent. One scan + one hash
    * aggregation.
    */
  def q114DecayedEngagement(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("value"),
      expr("ts DIV 1000").as("us"))
    val anchor = ev.agg(max(col("us")).as("__anchor"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("__w", round(exp(
        (col("us") - col("__anchor")).cast("double") / lit(86400000000.0 * 7.0)), 6)
        .cast("decimal(18,6)"))
      .withColumn("__term", col("value").cast("decimal(18,2)") * col("__w"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("__term")).cast("double") + lit(0.0)).as("decayed_value"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q115
  /** Weekly cohort retention: users grouped by their first-activity
    * epoch week, then each later week's active fraction of that cohort —
    * the classic retention triangle. Weeks are integer epoch-week
    * indexes (µs DIV week), cohorts a per-user min, the matrix
    * |weeks|²-bounded; everything is hash aggregation over the
    * (user, week) distinct frame and the rate is one exact-int division
    * rounded to 6dp.
    */
  def q115CohortRetention(s: SparkSession, d: String): DataFrame = {
    val uw = events(s, d)
      .select(col("user_id"), expr("(ts DIV 1000) DIV 604800000000").as("week"))
      .distinct()
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    uw.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("weeks_since"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size").cast("double"), 6)
          .as("retention"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  // ---------------------------------------------------------------- q116
  /** SimHash near-dup pairs over the dedup corpus: byte-band blocking
    * with guaranteed recall at Hamming ≤ 3 (pigeonhole over 4 bytes)
    * and exact bit_count(xor) verification — the cheapest pair tier
    * (one 32-bit sketch per doc, no shingle sets at join time),
    * catching the high-similarity core the Jaccard tiers verify more
    * expensively ([[operators.TextDedup.simhashPairs]]).
    */
  def q116SimhashPairs(s: SparkSession, d: String): DataFrame =
    operators.TextDedup.simhashPairs(dedupCorpus(s, d), "doc_id", "text",
        maxHamming = 3)
      .orderBy(col("id1"), col("id2"))

  // ---------------------------------------------------------------- q117
  /** Exact frequent tokens above 0.5% support via the mergeable
    * Misra–Gries candidate pass + exact recount
    * ([[operators.HeavyHitters]]): the operator for vocabularies too
    * large for a full `groupBy(token)` hash table — the summary ships
    * one ≤ k-entry map per partition, the recount touches only the
    * ≤ k candidates. k = 799 puts the MG undercount bound (n/800)
    * strictly under the n/200 threshold, so the output is provably
    * the exact frequency-threshold set.
    */
  def q117HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(
      explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    operators.HeavyHitters.frequentItems(toks, "token", k = 799,
        minCount = math.max(n / 200L, 1L), totalHint = Some(n))
      .select(col("item").as("token"), col("n"))
      .orderBy(col("token"))
  }

  // ---------------------------------------------------------------- q118
  /** Per-user session rollup under a 30-minute inactivity gap
    * ([[operators.Sessionize]]) — the batch face of q43's streaming
    * `session_window`, but with stable per-session indexes so raw
    * events can be joined back to their session. One user-partitioned
    * shuffle; the lag and running-sum windows never leave it.
    */
  def q118Sessions(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_id"),
      expr("ts DIV 1000").as("us"))
    operators.Sessionize.sessions(ev, "user_id", "us", "event_id",
        gap = 1800000000L)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_ts").as("start_us"), col("end_ts").as("end_us"),
        col("duration").as("duration_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  // ---------------------------------------------------------------- q119
  /** Triangle census of the co-purchase part graph (q83's edge
    * build) via oriented wedge join + closing-edge semi join
    * ([[operators.Triangles]]) — the clustering-structure companion
    * to PageRank's centrality: two hash joins, no driver-side graph.
    */
  def q119Triangles(s: SparkSession, d: String): DataFrame = {
    val edges = copurchasePairs(s, d)
      .select(col("pa").as("src"), col("pb").as("dst"))
    operators.Triangles.census(edges, "src", "dst")
  }

  // ---------------------------------------------------------------- q120
  /** Dense daily activity panel: per-user event counts resampled onto
    * the CORPUS calendar with zero-filled gaps — the regularization
    * step before any per-user time-series model. Complements q84's
    * forward-fill regrid, which interpolates each user's OWN span with
    * last-observation carry; here every user gets the same rectangular
    * calendar and absent days are true zeros (counts, not levels). The
    * calendar span is a 1-row broadcast; the grid is `users × days` by
    * construction (explode of a `sequence`), and the fill is one left
    * join against the per-(user, day) hash aggregate.
    */
  def q120Resample(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    grid.join(counts, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
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

  // ---------------------------------------------------------------- q123
  /** SCD Type-2 dimension build from the event change stream: per
    * user, consecutive runs of the same `event_type` collapse into one
    * version row with a `[valid_from, valid_to)` interval; the open
    * version carries the classic 9999-12-31 high date. Lag (change
    * detection), lead (interval close) and the version ordinal all run
    * inside one user-partitioned window — a single shuffle, the
    * warehouse-standard slowly-changing-dimension shape.
    */
  def q123Scd2(s: SparkSession, d: String): DataFrame = {
    val high = 253402300799000000L // 9999-12-31T23:59:59 in epoch-µs
    val ev = events(s, d).select(col("user_id"), col("event_id"),
      expr("ts DIV 1000").as("us"), col("event_type"))
    operators.Scd2.versions(ev, "user_id", "us", "event_id", "event_type", high)
      .select(col("user_id"), col("version_no"), col("event_type"),
        col("valid_from").as("valid_from_us"), col("valid_to").as("valid_to_us"))
      .orderBy(col("user_id"), col("version_no"))
  }

  // ---------------------------------------------------------------- q126
  /** Leakage-safe train/val/test split: assignment hashes the near-dup
    * CLUSTER id (the shared connected-components labels, singletons
    * falling back to their own doc_id), so near-duplicate documents can
    * never straddle a split boundary — the eval-contamination failure
    * mode of q58's plain per-doc hash split. The output keeps the
    * per-split census and an explicit audit pair: crossing near-dup
    * pairs under the cluster split (structurally 0) vs under the naive
    * doc-hash split (the leakage a per-doc split would have shipped).
    * Reuses the session pair + label artifacts — no new CC pass.
    */
  def q126LeakageSplit(s: SparkSession, d: String): DataFrame = {
    def bucket(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 100
    def splitOf(c: Column): Column =
      when(bucket(c) < 80, lit("train"))
        .when(bucket(c) < 90, lit("val")).otherwise(lit("test"))
    val lab = dedupLabels(s, d)
      .select(col("id").as("doc_id"), col("cluster"))
    val assigned = dedupCorpus(s, d).select(col("doc_id"))
      .join(lab, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster"), col("doc_id")))
      .withColumn("split", splitOf(col("cluster_id")))
      .withColumn("doc_split", splitOf(col("doc_id")))
      // consumed three times below (two pair-join sides + the census);
      // checkpoint the slim 4-column frame instead of recomputing the
      // corpus-derived subtree per consumer
      .localCheckpoint(true)
    val pj = dedupPairs(s, d).select(col("id1"), col("id2"))
      .join(assigned.select(col("doc_id").as("id1"), col("split").as("s1"),
        col("doc_split").as("ds1")), "id1")
      .join(assigned.select(col("doc_id").as("id2"), col("split").as("s2"),
        col("doc_split").as("ds2")), "id2")
    val audit = pj.agg(
      coalesce(sum(when(col("s1") =!= col("s2"), 1L).otherwise(0L)), lit(0L))
        .as("cross_pairs_cluster_split"),
      coalesce(sum(when(col("ds1") =!= col("ds2"), 1L).otherwise(0L)), lit(0L))
        .as("cross_pairs_doc_split"))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(broadcast(audit))
      .orderBy(col("split"))
  }

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

  // ---------------------------------------------------------------- q128
  /** Market-basket association rules over order baskets: pairwise
    * support, per-direction confidence, and lift — frequent-itemset
    * mining's first tier. All metrics publish as EXACT parts-per-
    * million integers (`1e6·ab DIV a` etc.), so there is zero float
    * in the result and any engine hashes identically. Basket sizes
    * are bounded (≤ 7 lines/order), so the pair explosion is linear
    * in orders; everything else is hash aggregation + broadcast-sized
    * joins on the item-support table.
    */
  def q128AssociationRules(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = li.select(col("ok")).distinct().count()
    val itemSup = li.groupBy(col("pk")).agg(count(lit(1)).as("sup"))
    // pair support comes straight off the shared co-purchase artifact —
    // the O(Σ basket²) self-join is paid once per session, not here
    val pairSup = copurchasePairs(s, d).filter(col("n_both") >= 2)
    pairSup
      .join(itemSup.select(col("pk").as("pa"), col("sup").as("sup_a")), "pa")
      .join(itemSup.select(col("pk").as("pb"), col("sup").as("sup_b")), "pb")
      .select(col("pa"), col("pb"), col("n_both"), col("sup_a"), col("sup_b"),
        expr("(1000000 * n_both) DIV sup_a").as("conf_ab_ppm"),
        expr("(1000000 * n_both) DIV sup_b").as("conf_ba_ppm"),
        // lift's n·ab·1e6 numerator overflows BIGINT at warehouse order
        // counts — DECIMAL(38,0) keeps the floor division exact
        expr(s"CAST((CAST($nOrders AS DECIMAL(38,0)) * n_both * 1000000)" +
          " div (CAST(sup_a AS DECIMAL(38,0)) * sup_b) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("pa"), col("pb"))
      .limit(30)
  }

  // ---------------------------------------------------------------- q129
  /** Gini concentration of user activity — how unequally events spread
    * across users, the inequality metric of traffic/engagement audits.
    * Uses the sorted-rank identity `G = (2·Σ i·x_i − (n+1)·Σx) /
    * (n·Σx)` with ranks from the range-partitioned distributed sort
    * (q12's ordinal machinery — no global window), published as an
    * EXACT floor-divided ppm integer: every term is integer
    * arithmetic, so the result is engine-identical by construction.
    * Rank ties among equal counts cannot change the sum (equal x_i
    * commute), so any total tie-break yields the same Gini.
    */
  def q129Gini(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"))
    val ranked = operators.Ordinals.withOrderedOrdinal(
      counts, Seq(col("x"), col("user_id")), "i")
    ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("i") * col("x")).as("six"))
      .select(col("n").as("n_users"), col("sx").as("n_events"),
        // DECIMAL(38,0) arithmetic: the *1e6 numerator would overflow
        // BIGINT near ~3e5 users x 100 events; `div` on decimals keeps
        // the floor-division exactness
        expr("CAST(((CAST(six AS DECIMAL(38,0)) * 2" +
          " - (CAST(n AS DECIMAL(38,0)) + 1) * CAST(sx AS DECIMAL(38,0)))" +
          " * 1000000) div (CAST(n AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("gini_ppm"))
  }

  // ---------------------------------------------------------------- q130
  /** A/B experiment readout: users hash-assigned to two arms (q58's
    * md5 discipline — content-keyed, reproducible on any engine), then
    * per-arm mean/variance of event value and the Welch t statistic.
    * Sums and sums-of-squares accumulate in DECIMAL (exact, order-
    * independent); each published double is one fixed expression tree
    * over those exact sums, rounded at 6dp — the q63 correlation
    * discipline applied to experiment analysis.
    */
  def q130AbTest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("value"))
      .withColumn("arm",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2 === 0, lit("A")).otherwise(lit("B")))
      .withColumn("v", col("value").cast("decimal(18,2)"))
    val arms = ev.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("s").as("s_a"), col("ss").as("ss_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("s").as("s_b"), col("ss").as("ss_b"))
    a.crossJoin(broadcast(b))
      .withColumn("mean_a", col("s_a").cast("double") / col("n_a").cast("double"))
      .withColumn("mean_b", col("s_b").cast("double") / col("n_b").cast("double"))
      .withColumn("var_a",
        (col("ss_a").cast("double") -
          col("s_a").cast("double") * col("s_a").cast("double") /
            col("n_a").cast("double")) / (col("n_a").cast("double") - 1.0))
      .withColumn("var_b",
        (col("ss_b").cast("double") -
          col("s_b").cast("double") * col("s_b").cast("double") /
            col("n_b").cast("double")) / (col("n_b").cast("double") - 1.0))
      .select(col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("var_a"), 6).as("var_a"),
        round(col("var_b"), 6).as("var_b"),
        round((col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_a").cast("double") +
               col("var_b") / col("n_b").cast("double")), 6).as("t_welch"))
  }

  // ---------------------------------------------------------------- q131
  /** Kaplan–Meier churn survival over user lifetimes: duration = first
    * to last event in whole days; users still active in the last 7
    * days of the corpus are right-censored (their lifetime is a lower
    * bound, exactly the estimator's reason to exist). At each distinct
    * duration the at-risk count comes from prefix sums over the
    * duration-distinct frame (≤ |users| rows — the one unpartitioned
    * window here is aggregation-sized, not corpus-sized), and the
    * survival product uses the q100 log discipline: per-factor
    * `round(ln(1−d/n), 6)` summed in DECIMAL, exponentiated once —
    * engine-exact, with an explicit zero once a stratum exhausts its
    * risk set.
    */
  def q131Survival(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = events(s, d).select(col("user_id"), expr("ts DIV 1000").as("us"))
    val anchor = ev.agg(max(col("us")).as("end_us"))
    val life = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(anchor))
      .select(expr(s"(last_us - first_us) DIV $dayUs").as("t"),
        (col("end_us") - col("last_us") < lit(7L * dayUs)).as("censored"))
    val strata = life.groupBy(col("t"))
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("d"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    strata
      .crossJoin(broadcast(life.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("alive", min(when(col("d") < col("n_risk"), 1L).otherwise(0L))
        .over(w))
      .withColumn("logterm",
        when(col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")), 6).cast("decimal(18,6)"))
          .otherwise(lit(null)))
      .withColumn("surv",
        when(col("alive") === 1L,
          round(exp(sum(col("logterm")).over(w).cast("double")), 6))
          .otherwise(lit(0.0)))
      .select(col("t").as("t_days"), col("n_risk"), col("d"), col("c"),
        col("surv"))
      .orderBy(col("t_days"))
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

  // ---------------------------------------------------------------- q133
  /** Population-stability-index drift monitor: the event-value
    * distribution of the first corpus week (baseline) vs everything
    * after, over baseline-decile bins — the standard model-input drift
    * check of ML monitoring. Bin edges are the EXACT distributed
    * quantiles rounded to 6dp on both engines (so binning compares
    * identical doubles); bin membership is a broadcast 9-edge array
    * probe in the scan stage; proportions are Laplace-smoothed exact
    * rationals so no bin can zero out the log; each PSI term rounds
    * its one `ln` at 6dp and the total sums those terms in DECIMAL.
    */
  def q133PsiDrift(s: SparkSession, d: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val ev = events(s, d).select(expr("ts DIV 1000").as("us"), col("value"))
    val t0 = ev.agg(min(col("us")).as("t0"))
    val tagged = ev.crossJoin(broadcast(t0))
      .withColumn("period",
        when(col("us") < col("t0") + lit(weekUs), lit("A")).otherwise(lit("B")))
      .select(col("period"), col("value"))
    val edges = operators.Quantiles.exactQuantiles(
        tagged.filter(col("period") === "A"), Seq.empty, "value",
        (1 to 9).map(_ / 10.0))
      .agg(sort_array(collect_list(round(col("quantile"), 6))).as("edges"))
    val counts = tagged.crossJoin(broadcast(edges))
      .withColumn("bin",
        expr("size(filter(edges, e -> value > e))").cast("long"))
      .groupBy(col("period"), col("bin")).agg(count(lit(1)).as("n"))
    val joined = s.range(0, 10).select(col("id").as("bin"))
      .join(counts.filter(col("period") === "A")
        .select(col("bin"), col("n").as("n_a")), Seq("bin"), "left")
      .join(counts.filter(col("period") === "B")
        .select(col("bin"), col("n").as("n_b")), Seq("bin"), "left")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    val terms = joined
      .crossJoin(broadcast(joined.agg(sum(col("n_a")).as("ta"),
        sum(col("n_b")).as("tb"))))
      .withColumn("pa",
        (col("n_a") + 1L).cast("double") / (col("ta") + 10L).cast("double"))
      .withColumn("pb",
        (col("n_b") + 1L).cast("double") / (col("tb") + 10L).cast("double"))
      .withColumn("psi_term", round((col("pb") - col("pa")) *
        round(log(col("pb") / col("pa")), 6), 6))
    terms
      .crossJoin(broadcast(terms.agg(
        (sum(col("psi_term").cast("decimal(18,6)")).cast("double") + lit(0.0))
          .as("psi_total"))))
      .select(col("bin"), col("n_a"), col("n_b"), col("psi_term"),
        col("psi_total"))
      .orderBy(col("bin"))
  }

  // ---------------------------------------------------------------- q134
  /** Label-propagation community detection over the co-purchase part
    * graph ([[operators.LabelPropagation]]) — the community layer
    * between connected components (q67: pure reachability) and
    * PageRank (q83: centrality): 5 synchronous rounds, ties to the
    * smallest label, over the SAME shared pair artifact as
    * q83/q119/q128, so the edge build costs nothing here.
    */
  def q134Communities(s: SparkSession, d: String): DataFrame =
    operators.LabelPropagation.communities(
        copurchasePairs(s, d).select(col("pa").as("src"), col("pb").as("dst")),
        "src", "dst", rounds = 5)
      .orderBy(col("node"))

  // ---------------------------------------------------------------- q135
  /** Rolling-window anomaly flags over each user's event-value stream:
    * an event is anomalous when it sits more than 3 sigma from the
    * mean of the user's previous 8 events — the standard streaming
    * outlier gate, evaluated batch-side. EXACT arithmetic throughout:
    * values become integer cents in the scan stage, the rolling
    * mean/variance live as integer sums, and the 3-sigma test is the
    * cross-multiplied integer comparison `(n·v − s)² > 9·(n·q − s²)`
    * — zero floats, so any engine flags the identical rows
    * ([[operators.RollingAnomaly]]). The output is the anomalies only.
    */
  def q135RollingAnomaly(s: SparkSession, d: String): DataFrame =
    operators.RollingAnomaly.anomalies(
        events(s, d).select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("us"), col("value"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc")),
        "user_id", "us", "event_id", "vc")
      .select(col("user_id"), col("event_id"), col("us"), col("value"),
        col("window_n"))
      .orderBy(col("user_id"), col("us"), col("event_id"))

  // ---------------------------------------------------------------- q136
  /** Offline CUSUM changepoint detection per user: the event index
    * where the cumulative deviation from the user's overall mean value
    * peaks — the classic single-changepoint location statistic
    * (max_k |Σ_{i≤k} (x_i − x̄)|). EXACT: deviations are
    * cross-multiplied by the user's event count (`n·Σvc − k·S` in
    * integer cents), so the argmax compares exact integers and ties
    * break to the earliest event identically on any engine
    * ([[operators.Changepoint]]).
    */
  def q136Changepoint(s: SparkSession, d: String): DataFrame =
    operators.Changepoint.cusumPeak(
        events(s, d).select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc")),
        "user_id", "us", "event_id", "vc")
      .select(col("user_id"), col("cp_tie").as("cp_event_id"),
        col("cp_index"), col("cusum_abs"), col("n_rows").as("n_events"))
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q137
  /** Purged temporal train/val/test split over the event stream: rank
    * cutoffs at 70% / 85% of the `(us, event_id)` order (integer rank
    * arithmetic — `ceil(p·n)` as `(p·n + q−1) div q`, so the boundary
    * is a concrete event, not an interpolated float), with a one-day
    * EMBARGO around each boundary whose rows join no split — the
    * time-series leakage guard (features computed over trailing
    * windows straddle a naive boundary; the embargo absorbs that
    * lookback). The companion to q58's hash split (content-IID) and
    * q126's cluster split (near-dup-safe): this one is safe against
    * TEMPORAL leakage. Ranks come from the range-partitioned
    * distributed sort (q12's ordinal machinery — no global window);
    * cutoffs broadcast as 1-row frames; labeling is scan-stage.
    */
  def q137PurgedSplit(s: SparkSession, d: String): DataFrame = {
    val embargoUs = 86400000000L
    val ev = events(s, d).select(col("event_id"), expr("ts DIV 1000").as("us"))
    val ranked = operators.Ordinals.withOrderedOrdinal(
      ev, Seq(col("us"), col("event_id")), "i")
    val n = ranked.agg(count(lit(1)).as("c"))
    // both cutoffs in ONE pass over the ordinal (the ordinal's range
    // sort is the query's only fact-table shuffle — don't pay it twice)
    val cuts = broadcast(ranked.crossJoin(broadcast(n))
      .agg(max(when(col("i") <= expr("(7 * c + 9) div 10"), col("us")))
        .as("cut1"),
        max(when(col("i") <= expr("(17 * c + 19) div 20"), col("us")))
          .as("cut2")))
    ev.crossJoin(cuts)
      .withColumn("split",
        when(abs(col("us") - col("cut1")) <= embargoUs ||
             abs(col("us") - col("cut2")) <= embargoUs, lit("embargo"))
          .when(col("us") < col("cut1"), lit("train"))
          .when(col("us") < col("cut2"), lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), min(col("us")).as("min_us"),
        max(col("us")).as("max_us"))
      .orderBy(col("split"))
  }

  // ---------------------------------------------------------------- q138
  /** Leave-one-out target encoding of customer nation against order
    * value — the feature-engineering staple for high-cardinality
    * categoricals, in its leakage-safe form (each row's own target is
    * excluded from its category mean) plus the m-estimate smoothed
    * variant (m = 10 pseudo-observations of the global mean). EXACT:
    * targets become integer cents, and both encodings publish as
    * floor divisions of cross-multiplied integer sums in
    * DECIMAL(38,0) — `(n_all·(S_g − x) + m·S_all) div
    * (n_all·(n_g − 1 + m))` — so every encoded value is
    * engine-identical. One hash aggregation per level of grouping;
    * the category and global stats broadcast back.
    */
  def q138TargetEncode(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("nation"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x_cents"))
    val g = o.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_g"), sum(col("x_cents")).as("s_g"))
    val t = o.agg(count(lit(1)).as("n_all"), sum(col("x_cents")).as("s_all"))
    o.join(broadcast(g), Seq("nation"))
      .crossJoin(broadcast(t))
      .select(col("o_orderkey"), col("nation"), col("x_cents"),
        when(col("n_g") > 1, expr(
          "CAST((CAST(s_g AS DECIMAL(38,0)) - x_cents) div (n_g - 1) AS BIGINT)"))
          .as("loo_cents"),
        expr("CAST((CAST(n_all AS DECIMAL(38,0)) * (s_g - x_cents)" +
          " + 10 * CAST(s_all AS DECIMAL(38,0)))" +
          " div (CAST(n_all AS DECIMAL(38,0)) * (n_g - 1 + 10)) AS BIGINT)")
          .as("loo_smooth_cents"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------------------------- q139
  /** Lexical hard-negative candidate mining for retrieval training:
    * each query document's top-3 TF terms (ties alphabetical) form a
    * query, and the batch BM25 ranker
    * ([[operators.InvertedIndex.bm25TopKBatch]] — ONE corpus tokenize
    * for all queries) returns each query's 10 highest-scoring OTHER
    * documents: lexically close non-copies, exactly the negatives
    * contrastive training wants. Self-exclusion re-ranks inside the
    * ≤11-row per-query frame (bounded window).
    */
  def q139HardNegatives(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val qtf = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("query_id"), col("term")).agg(count(lit(1)).as("tf"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("tf").desc, col("term"))
    val qterms = qtf.withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= 3).select(col("query_id"), col("term"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    operators.InvertedIndex.bm25TopKBatch(docs, "doc_id", "text",
        qterms, "query_id", "term", k = 11)
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms_hit"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q140
  /** Per-node local clustering coefficient of the co-purchase graph
    * ([[operators.Triangles.perNodeCensus]]) — the node-level
    * companion to q119's global census: how close each part's
    * neighborhood is to a clique, as an exact ppm integer. Reuses the
    * shared co-purchase pair artifact; triangles enumerate once at
    * their orientation apex and credit all three corners via a
    * 3-struct explode + hash count.
    */
  def q140ClusteringCoeff(s: SparkSession, d: String): DataFrame =
    operators.Triangles.perNodeCensus(
        copurchasePairs(s, d).select(col("pa").as("src"), col("pb").as("dst")),
        "src", "dst")
      .orderBy(col("node"))

  // ---------------------------------------------------------------- q141
  /** Audio silence-span detection (VAD-lite) — the speech-curation
    * step between raw audio and training segments: burst-pattern WAVs
    * (alternating square-wave and true-zero bursts, one per selected
    * supplier) are REALLY decoded ([[operators.Multimodal
    * .audioFrameEnergy]], JDK PCM reader), cut into 160-sample
    * analysis frames with exact integer energies, and maximal silent
    * runs become spans via the gaps-and-islands window
    * ([[operators.Multimodal.silenceSpans]]). The oracle predicts the
    * spans analytically from the burst geometry — the decode itself is
    * the thing under test.
    */
  def q141SilenceSpans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = supplier(s, d).select(col("s_suppkey"))
      .filter(col("s_suppkey") % 3 === 0)
      .as[Long].map { k =>
        Multimodal.MediaRecord(k, "audio", Multimodal.burstWav(
          sampleRate = 8000, amplitude = (1000 + k * 31 % 20000).toInt,
          nSamples = (4000 + k % 50 * 100).toInt,
          burstLen = (400 + k % 5 * 80).toInt))
      }
    Multimodal.silenceSpans(
        Multimodal.audioFrameEnergy(recs, frameSamples = 160), threshold = 0L)
      .orderBy(col("media_id"), col("span_idx"))
  }

  // ---------------------------------------------------------------- q142
  /** Perceptual image dedup via difference-hash — the image analog of
    * q25's SimHash: deterministic block-gradient PNGs (one per
    * selected part; keys pair up as `(10j, 10j+5)` where the odd
    * member is a uniform +1 brightness shift of the even one) are
    * REALLY decoded and box-filtered to a 9×8 luminance grid with
    * exact integer cell sums ([[operators.Multimodal.imageDHashes]]),
    * and duplicate pairs surface through a hash-equality self-join —
    * O(n) shuffle on the 64-bit hash, never a pixel-space n² compare.
    * The planted shift changes every byte (md5 differs) but no
    * adjacent-cell comparison, so only the perceptual hash finds the
    * pair; the oracle replays the cell formula and bit-packing in SQL.
    */
  def q142ImageDhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = part(s, d).select(col("p_partkey"))
      .filter(col("p_partkey") % 5 === 0)
      .as[Long].map { k =>
        Multimodal.MediaRecord(k, "image",
          Multimodal.gridPng(seed = k - k % 10, delta = ((k % 10) / 5).toInt))
      }
    val hashes = Multimodal.imageDHashes(recs).toDF()
      .select(col("media_id"), col("hash_hi"), col("hash_lo"))
    hashes.as("a").join(hashes.as("b"),
        col("a.hash_hi") === col("b.hash_hi") &&
          col("a.hash_lo") === col("b.hash_lo") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.hash_hi").as("hash_hi"), col("a.hash_lo").as("hash_lo"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------- q143
  /** Blocked edit-distance record linkage ([[operators.FuzzyJoin
    * .blockedLevenshtein]]): customer-name near-matches within a
    * nation block, Levenshtein ≤ 2. The n² fuzzy compare becomes
    * per-block candidate pairs pruned by a length band before the
    * codegen'd threshold-form `levenshtein` runs — the classic
    * blocking+verify entity-resolution shape. Edit distance is an
    * exact integer (Wagner–Fischer on both engines), so the oracle is
    * a plain SQL replay.
    */
  def q143FuzzyBlocking(s: SparkSession, d: String): DataFrame =
    operators.FuzzyJoin.blockedLevenshtein(
        customer(s, d).select(col("c_custkey"), col("c_nationkey"),
          col("c_name")),
        "c_custkey", "c_name", Seq("c_nationkey"), maxDist = 2)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))

  // ---------------------------------------------------------------- q144
  /** Bounded-depth BFS reachability ([[operators.Bfs.reachable]]) over
    * the (≥2-support) co-purchase graph: exact shortest-hop distance
    * from the `p_partkey % 500 = 0` seed set, 3 hops out. Frontier
    * iteration — one hash join + distinct + visited anti join per hop,
    * work proportional to frontier-incident edges (never to paths).
    * The oracle unrolls the three hops as explicit level CTEs with
    * NOT-IN visited pruning — bit-equal min-hop semantics, no
    * recursion needed at fixed depth. Fifth consumer of the shared
    * co-purchase edge artifact.
    */
  def q144BfsReach(s: SparkSession, d: String): DataFrame = {
    val e = copurchasePairs(s, d).filter(col("n_both") >= 2)
      .select(col("pa"), col("pb"))
    val seeds = part(s, d).filter(col("p_partkey") % 500 === 0)
      .select(col("p_partkey"))
    operators.Bfs.reachable(e, "pa", "pb", seeds, maxHops = 3)
      .select(col("node"), col("hop").cast("long").as("hop"))
      .orderBy(col("node"))
  }

  // ---------------------------------------------------------------- q145
  /** Ordered conversion funnel ([[operators.Funnel.stageCounts]]):
    * view → click → purchase with a strict AFTER constraint per user.
    * Each stage is one user-key hash join against the shrinking
    * reached-set plus one min hash-agg; conversion is exact-integer
    * ppm. The oracle unrolls the stages as min-aggregation CTEs —
    * same strict-inequality semantics (driver events are µs-unique
    * per user, checked at all three scales).
    */
  def q145Funnel(s: SparkSession, d: String): DataFrame =
    operators.Funnel.stageCounts(events(s, d), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .select(col("stage_idx").cast("long").as("stage_idx"), col("stage"),
        col("n_users"), col("conv_ppm"))
      .orderBy(col("stage_idx"))

  // ---------------------------------------------------------------- q146
  /** Per-user time-weighted average of the event value
    * ([[operators.TimeWeighted.twa]]): each value is weighted by how
    * long it stayed current (µs gap to the user's next event), so
    * burst sampling doesn't dominate the mean. One user-partitioned
    * window + one hash agg; the value×duration sum accumulates in
    * exact DECIMAL, with a single deterministic double division at
    * the end.
    */
  def q146Twa(s: SparkSession, d: String): DataFrame =
    operators.TimeWeighted.twa(
        events(s, d).withColumn("us", expr("ts DIV 1000")), // ns → µs exact
        "user_id", "us", "value")
      .select(col("k").as("user_id"), col("n_events"), col("span_us"),
        col("twa"))
      .orderBy(col("user_id"))

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

  // ---------------------------------------------------------------- q148
  /** Fixed-budget k-core peeling ([[operators.KCore.peelRounds]]) of
    * the (≥2-support) co-purchase graph: 12 rounds of "drop nodes with
    * < 3 surviving neighbors". A FIXED round budget makes the result a
    * closed-form function of the input (idempotent once converged —
    * 12 ≥ the peel depth at every test scale), so the oracle replays
    * the rounds as unrolled CTEs; the fixpoint variant
    * ([[operators.KCore.kCore]]) is spec-pinned against brute force.
    * Sixth consumer of the shared co-purchase edge artifact.
    */
  def q148KcorePeel(s: SparkSession, d: String): DataFrame =
    operators.KCore.peelRounds(
        copurchasePairs(s, d).filter(col("n_both") >= 2)
          .select(col("pa"), col("pb")),
        "pa", "pb", k = 3, rounds = 12)
      .select(col("node"), col("deg"))
      .orderBy(col("node"))

  // ---------------------------------------------------------------- q149
  /** Shot-boundary detection over REAL video decode
    * ([[operators.Multimodal.sceneSegments]]): deterministic
    * uncompressed AVIs (solid frames whose colors jitter by ±1 within
    * a "shot" and jump at shot changes) are decoded by the RIFF
    * walker, and scenes segmented where the L1 frame-difference
    * exceeds 30. Decode is partition-preserving mapPartitions; the
    * segmentation is one media-partitioned window + one hash agg. The
    * oracle predicts every frame color analytically from the fixture
    * formula (lossless frames ⇒ exact integer means).
    */
  def q149SceneChange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = supplier(s, d).select(col("s_suppkey"))
      .filter(col("s_suppkey") % 5 === 1)
      .as[Long].map { k =>
        val n = (12 + k % 7).toInt
        val shot = (3 + k % 3).toInt
        val colors = (0 until n).map { f =>
          val sIdx = f / shot
          (((k * 37 + sIdx * 89) % 254 + f % 2).toInt,
            ((k * 53 + sIdx * 131) % 254 + f % 2).toInt,
            ((k * 71 + sIdx * 17) % 254 + f % 2).toInt)
        }
        Multimodal.MediaRecord(k, "video", Multimodal.solidAvi(32, 24, 10, colors))
      }
    Multimodal.sceneSegments(Multimodal.videoFrameFeatures(recs, stride = 1),
        threshold = 30)
      .orderBy(col("media_id"), col("scene_idx"))
  }

  // ---------------------------------------------------------------- q150
  /** HyperLogLog cardinality sketch ([[operators.Sketches
    * .hllRegisters]]/[[operators.Sketches.hllEstimate]], p = 6) of
    * per-source token vocabularies, alongside the exact count — the
    * mergeable-register companion to q105's KMV bottom-k. Registers
    * are exact content-keyed integers (same md5-48 line), merged by
    * per-bucket max with map-side combining; the harmonic sum is an
    * exact BIGINT (`Σ 2^(49−rho)`), so only the final three IEEE ops
    * are float.
    */
  def q150HllSketch(s: SparkSession, d: String): DataFrame = {
    import operators.Sketches
    val toks = documents(s, d).select(col("source"),
      explode(functions.TextAnalysis.tokens(col("text"))).as("tok"))
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(toks, Seq("source"), "tok", p = 6),
      Seq("source"), p = 6)
    val exact = toks.select(col("source"), col("tok")).distinct()
      .groupBy("source").agg(count(lit(1)).as("exact_distinct"))
    est.join(exact, "source")
      .select(col("source"), col("n_zero"), col("s_scaled"),
        col("est_distinct"), col("exact_distinct"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q151
  /** Equal-frequency WoE binning ([[operators.WoeBinning.woeBins]]):
    * decile bins of `l_extendedprice` under a total order, scored
    * against the `l_returnflag = 'R'` target. Bin membership is pure
    * integer rank arithmetic ((rn−1)·10 DIV n — no interpolated edge
    * values cross engines); the rank is the range-partitioned
    * distributed sort the exact-quantile operator uses.
    */
  def q151WoeBinning(s: SparkSession, d: String): DataFrame =
    operators.WoeBinning.woeBins(
        lineitem(s, d), "l_extendedprice", col("l_returnflag") === "R",
        Seq(col("l_extendedprice").asc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_partkey").asc,
          col("l_suppkey").asc),
        nBins = 10)
      .orderBy(col("bin"))

  // ---------------------------------------------------------------- q152
  /** Degree assortativity ([[operators.GraphStats
    * .degreeAssortativity]]) of the co-purchase graph — the
    * hub-to-hub mixing scalar. One degree hash-agg + two node-key
    * joins + one exact-DECIMAL moment aggregation; only the final
    * Pearson division is float. Seventh consumer of the shared edge
    * artifact.
    */
  def q152Assortativity(s: SparkSession, d: String): DataFrame =
    operators.GraphStats.degreeAssortativity(
      copurchasePairs(s, d).select(col("pa"), col("pb")), "pa", "pb")

  // ---------------------------------------------------------------- q153
  /** Mann–Whitney U rank-sum test ([[operators.MannWhitney.uTest]]):
    * purchase vs click event values, midranks with tie correction.
    * Ranking runs over the distinct-VALUE frame (one value-keyed hash
    * agg + a bounded window over ~56k distinct 2-dp values), never
    * over raw rows; rank mass stays exact in half-integers (×2
    * BIGINTs) and the normal approximation runs once on one row.
    */
  def q153MannWhitney(s: SparkSession, d: String): DataFrame =
    operators.MannWhitney.uTest(
      events(s, d).filter(col("event_type").isin("click", "purchase")),
      "value", col("event_type") === "purchase")

  // ---------------------------------------------------------------- q154
  /** Hamming-tolerant perceptual dedup ([[operators.Multimodal
    * .nearDupDHashPairs]]): dHash near-dups within distance 2 via the
    * 4-band multi-index join — the scale path for "almost identical
    * image" discovery (q142's exact-equality join misses single-bit
    * mutants). The fixture plants a single-cell brightness bump per
    * pair (≤ 2 hash bits flip, structurally); real PNG decode on both
    * members; the oracle replays every hash bit AND the brute-force
    * Hamming join from the cell formula — by pigeonhole the banded
    * candidate set equals brute force at distance ≤ 3.
    */
  def q154DhashHamming(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import operators.Multimodal
    val recs = part(s, d).select(col("p_partkey"))
      .filter(col("p_partkey") % 5 === 2)
      .as[Long].map { k =>
        val kb = k - k % 10 // pair members: k%10 = 2 (base) and 7 (mutant)
        if (k % 10 == 2)
          Multimodal.MediaRecord(k, "image", Multimodal.gridPng(kb, 0))
        else
          Multimodal.MediaRecord(k, "image", Multimodal.gridPng(kb, 0,
            bumpGx = ((kb / 10) % 9).toInt, bumpGy = ((kb / 10) % 8).toInt,
            bumpDelta = 120))
      }
    Multimodal.nearDupDHashPairs(
        Multimodal.imageDHashes(recs).toDF()
          .select(col("media_id"), col("hash_hi"), col("hash_lo")),
        maxHamming = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------- q155
  /** Sorted-neighborhood linkage ([[operators.FuzzyJoin
    * .sortedNeighborhood]]): customers ranked by (name, key), pairs
    * within 3 rank positions verified at Levenshtein ≤ 2 — the
    * boundary-straddling complement to q143's hard blocking.
    * Candidates are O(n·window) by construction (rank-band join on
    * the ordinal line); the rank itself is the range-partitioned
    * distributed sort.
    */
  def q155SortedNeighborhood(s: SparkSession, d: String): DataFrame =
    operators.FuzzyJoin.sortedNeighborhood(
        customer(s, d), "c_custkey", "c_name",
        Seq(col("c_name").asc, col("c_custkey").asc),
        window = 3, maxDist = 2)
      .select(col("id_a"), col("id_b"), col("gap"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))

  // ---------------------------------------------------------------- q156
  /** Count-min sketch ([[operators.Sketches.cmsSketch]]/[[operators
    * .Sketches.cmsQuery]], 4×256): token frequencies sketched into
    * 1024 exact BIGINT counters (mergeable by cell-wise addition —
    * the map-side combine IS the merge), then point-queried for the
    * 25 most frequent tokens and compared to exact counts. CMS is
    * integer end to end — the overestimate column is exact on both
    * engines.
    */
  def q156CmsSketch(s: SparkSession, d: String): DataFrame = {
    import operators.Sketches
    // the token frame feeds THREE consumers (sketch, exact counts,
    // probe ranking) — materialize the tokenization once instead of
    // re-splitting the corpus per DAG branch; spread the single-file
    // scan first (real corpora get that from file splits)
    val toks = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(functions.TextAnalysis.tokens(col("text"))).as("tok"))
      .localCheckpoint(true)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val probes = exact
      .orderBy(col("exact_cnt").desc, col("tok")).limit(25)
      .localCheckpoint(true) // 25 rows, referenced twice
    val sketch = Sketches.cmsSketch(toks, "tok", depth = 4, width = 256)
    Sketches.cmsQuery(sketch, probes.select("tok"), "tok",
        depth = 4, width = 256)
      .join(probes, "tok")
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("tok"))
  }

  // ---------------------------------------------------------------- q157
  /** Per-user engagement trend ([[operators.Regression.olsPerKey]]):
    * value regressed on the user's seconds-offset timeline — ~1500
    * independent OLS fits in ONE key-partitioned moment aggregation
    * (five exact DECIMAL moments, closed-form ratios, no iteration).
    * The x offset is exact integer seconds ((ts − min ts) DIV 1e9 on
    * the ns line ≡ µs DIV 1e6 on the oracle's).
    */
  def q157UserTrend(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("__x",
      expr("(ts - min(ts) OVER (PARTITION BY user_id)) DIV 1000000000"))
    operators.Regression.olsPerKey(ev, "user_id", "__x", "value")
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q158
  /** Trimmed mean ([[operators.Quantiles.trimmedMean]]): per-flag 5%
    * two-sided truncated mean of `l_extendedprice` — the robust
    * location estimate outlier-heavy feeds need. Rank cutoffs are
    * exact integer ppm arithmetic on the range-partitioned ordinal;
    * the core sum is DECIMAL; one float division per group.
    */
  def q158TrimmedMean(s: SparkSession, d: String): DataFrame =
    operators.Quantiles.trimmedMean(lineitem(s, d), Seq("l_returnflag"),
        "l_extendedprice", trimPpm = 50000,
        tieBreak = Seq(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_suppkey").asc))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q159
  /** Benford first-digit audit ([[operators.Benford.firstDigitAudit]])
    * of order totals per order status — the forensic ingest gate.
    * One (group, digit) hash agg + a 9-row-per-group dense frame; χ²
    * terms are 6-dp DECIMALs so the sum is order-independent.
    */
  def q159Benford(s: SparkSession, d: String): DataFrame =
    operators.Benford.firstDigitAudit(orders(s, d), Seq("o_orderstatus"),
        "o_totalprice")
      .orderBy(col("o_orderstatus"), col("digit"))

  // ---------------------------------------------------------------- q160
  /** Jaro–Winkler linkage on the native expression
    * ([[graft.plans.JaroWinklerExpr]] — Spark has no built-in; a UDF
    * would box every pair): within-nation candidate pairs scored in a
    * tight primitive loop, kept at rounded jw ≥ 0.985 (≈ one edit or
    * one adjacent transposition on these names). The threshold is
    * applied to the ROUNDED score on both engines so ULP noise cannot
    * flip membership; DuckDB's `jaro_winkler_similarity` is the
    * oracle (byte-identical semantics, probed: integer-halved
    * transpositions, 0.7 boost gate, prefix cap 4, empty ⇒ 0).
    */
  def q160JaroWinkler(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      col("c_name"))
    // CPU is O(pairs): spread the stream side (single-file scan) first
    val a = base.repartition(s.sparkContext.defaultParallelism)
      .select(col("c_custkey").as("id_a"), col("c_nationkey").as("na"),
        col("c_name").as("name_a"))
    val b = base.select(col("c_custkey").as("id_b"),
      col("c_nationkey").as("nb"), col("c_name").as("name_b"))
    a.join(b, col("na") === col("nb") && col("id_a") < col("id_b"))
      .withColumn("jw", round(graft.plans.JaroWinklerExpr.jaroWinkler(
        col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.985)
      .select(col("id_a"), col("id_b"), col("jw"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------- q161
  /** Personalized PageRank ([[operators.PageRank.personalizedRanks]])
    * from the `p_partkey % 300 = 0` anchor set over the co-purchase
    * graph — "related items from these anchors". Same one-join +
    * one-agg iteration as q83 with a seed restart vector; eighth
    * consumer of the shared edge artifact. The oracle unrolls the
    * three iterations exactly like q83's, with the seed-mass restart
    * in place of the uniform base.
    */
  def q161PersonalizedPr(s: SparkSession, d: String): DataFrame = {
    val p = copurchasePairs(s, d)
    val edges = p.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(p.select(col("pb").as("src"), col("pa").as("dst")))
    val seeds = part(s, d).filter(col("p_partkey") % 300 === 0)
      .select(col("p_partkey").as("node"))
    operators.PageRank.personalizedRanks(edges, "src", "dst", seeds, iters = 3)
      .withColumn("prr", round(col("pr"), 6))
      .filter(col("prr") > 0.0) // untouched nodes are exact zeros
      .orderBy(col("prr").desc, col("node"))
      .limit(20)
      .select(col("node").as("part"), col("prr").as("pr"))
  }

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

  // ---------------------------------------------------------------- q163
  /** Two-sample Kolmogorov–Smirnov drift test ([[operators.KsTest
    * .ksTwoSample]]): purchase vs click value distributions. The
    * supremum runs on exact BIGINT ECDF numerators (`|c_A·n_B −
    * c_B·n_A|`) over the distinct-value frame — no float until the
    * one published ratio; the argmax value is the deterministic
    * tie-broken supremum location.
    */
  def q163KsTest(s: SparkSession, d: String): DataFrame =
    operators.KsTest.ksTwoSample(
      events(s, d).filter(col("event_type").isin("click", "purchase")),
      "value", col("event_type") === "purchase")

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

  // ---------------------------------------------------------------- q165
  /** Asymmetric shingle containment ([[operators.TextDedup
    * .containmentPairs]]): each prefix-dropped mutant against its
    * origin doc — the quote/excerpt signal Jaccard misses (Broder's
    * resemblance-vs-containment split). Pair-list-driven: shingle
    * sets are semi-joined to the candidates BEFORE the intersection
    * join, so cost scales with pairs, not the corpus. Integer end to
    * end (ppm ratios).
    */
  def q165Containment(s: SparkSession, d: String): DataFrame = {
    val pairs = documents(s, d).filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000).as("id1"), col("doc_id").as("id2"))
    operators.TextDedup.containmentPairs(dedupCorpus(s, d), "doc_id",
        "text", pairs)
      .orderBy(col("id1"))
  }

  // ---------------------------------------------------------------- q166
  /** Histogram-sketch quantiles ([[operators.Sketches.histSketch]] /
    * [[operators.Sketches.histQuantiles]]): the mergeable scale path
    * beside q48's exact sort (bin counts ADD across
    * partitions/days — the map-side combine is the merge; error ≤ one
    * bin width by construction). Prices become exact integer cents via
    * the DECIMAL cast; target ranks, cumulative walk and within-bin
    * interpolation are integer end to end — no float anywhere.
    */
  def q166HistQuantiles(s: SparkSession, d: String): DataFrame = {
    import operators.Sketches
    val cents = lineitem(s, d).select(
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val sketch = Sketches.histSketch(cents, "cents", binWidth = 100000L)
    Sketches.histQuantiles(sketch, binWidth = 100000L,
        qPpm = Seq(500000L, 900000L, 990000L))
      .orderBy(col("q_ppm"))
  }

  // ---------------------------------------------------------------- q167
  /** Cross-source duplication matrix: the verified near-dup pair set
    * (shared [[dedupPairs]] artifact — ninth consumer) rolled up by
    * the SOURCE pair it straddles, orientation-normalized. The
    * operational "which feeds duplicate each other" report every
    * multi-source corpus needs before sampling weights are set.
    * Two broadcast-sized joins over the pair list — cost is O(pairs).
    */
  def q167DupSourceMatrix(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    val idSrc = dedupPairs(s, d).select(col("id1").as("id"))
      .unionAll(dedupPairs(s, d).select(col("id2").as("id"))).distinct()
      .withColumn("base", pmod(col("id"), lit(1000000L)))
      .join(src, col("base") === col("doc_id"))
      .select(col("id"), col("source"))
    dedupPairs(s, d)
      .join(idSrc.select(col("id").as("id1"), col("source").as("sa")), Seq("id1"))
      .join(idSrc.select(col("id").as("id2"), col("source").as("sb")), Seq("id2"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---------------------------------------------------------------- q168
  /** Quantile normalization ([[operators.Quantiles
    * .normalizeToReference]]): returned-flag line prices mapped onto
    * the 'N'-flag distribution — the batch-effect corrector. Pure
    * integer rank mapping (`⌈r·n_ref/n⌉`, type-1), two ordinal sorts
    * + one rank-index hash join; no interpolation to disagree on
    * across engines.
    */
  def q168QuantileNormalize(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val a = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
    val ref = li.filter(col("l_returnflag") === "N")
      .select(col("l_extendedprice"))
    operators.Quantiles.normalizeToReference(a,
        Seq(col("l_extendedprice").asc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_partkey").asc,
          col("l_suppkey").asc),
        ref, "l_extendedprice")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
  }

  // ---------------------------------------------------------------- q169
  /** Last-touch revenue attribution ([[operators.TemporalJoins
    * .asofJoin]]): every purchase is attributed to the user's latest
    * prior click/view (or 'direct' when none) and revenue rolled up
    * per channel. The as-of join is the union-window formulation —
    * one user-partitioned shuffle, no per-row probing; revenue sums
    * in DECIMAL.
    */
  def q169Attribution(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("value").cast("decimal(18,2)").as("v"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("touch_ts"),
        col("event_type").as("touch_type"))
    operators.TemporalJoins.asofJoin(purchases, touches, Seq("user_id"),
        "ts", "touch_ts", Seq("touch_type"))
      .withColumn("channel", coalesce(col("touch_type"), lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v")).cast("double").as("revenue"))
      .orderBy(col("channel"))
  }

  // ---------------------------------------------------------------- q171
  /** Power-law degree-tail exponent ([[operators.GraphStats
    * .powerLawAlpha]], Newman's MLE, dmin = 10) of the co-purchase
    * graph — tenth consumer of the shared edge artifact. 6-dp DECIMAL
    * ln sums; one float row.
    */
  def q171PowerLaw(s: SparkSession, d: String): DataFrame =
    operators.GraphStats.powerLawAlpha(
      copurchasePairs(s, d).select(col("pa"), col("pb")), "pa", "pb",
      dmin = 10L)

  // ---------------------------------------------------------------- q172
  /** JDBC sink round-trip — the ONE layer with no oracle-backed row
    * until now: a real import through [[api.Importer.importToJdbc]]
    * into embedded Derby (auto-create + completeCommit `appendAtomic`
    * staging on the first pass, then a keyed Upsert MERGE on a delta),
    * read back through the JDBC source. The oracle replays the merge
    * relationally (FULL JOIN + coalesce, delta wins). `bal` stays an
    * untouched IEEE double both ways (×2 is exact), so the hash
    * compare covers value fidelity through the sink, not just shape.
    * The tiny collect is the TABLE (≤ 60 rows read back from Derby),
    * never corpus data — it lets the in-memory database be dropped
    * eagerly instead of leaking per call.
    */
  def q172JdbcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.api.Importer
    val url = s"jdbc:derby:memory:graftq172_${System.nanoTime()};create=true"
    val base = customer(s, d).filter(col("c_custkey") <= 50)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
    Importer.importToJdbc(base, url, "q172_target",
      Importer.ImportConfig(mode = ImportMode.Insert,
        keyColumns = Seq("id"), createTableIfNeeded = true,
        completeCommit = true))
    val delta = customer(s, d)
      .filter(col("c_custkey") >= 26 && col("c_custkey") <= 60)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        (col("c_acctbal") * 2).as("bal"))
    Importer.importToJdbc(delta, url, "q172_target",
      Importer.ImportConfig(mode = ImportMode.Upsert,
        keyColumns = Seq("id")))
    val back = s.read.format("jdbc").option("url", url)
      .option("dbtable", "q172_target")
      .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver").load()
    val rows = back.select(col("ID").cast("long").as("id"),
        col("NAME").as("name"), col("BAL").cast("double").as("bal"))
      .collect().toSeq
    scala.util.Try(java.sql.DriverManager.getConnection(
      url.replace(";create=true", ";drop=true")))
    import s.implicits._
    rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toDF("id", "name", "bal").orderBy(col("id"))
  }

  // ---------------------------------------------------------------- q170
  /** Zipf's-law fit per language: the log-log rank–frequency slope
    * over each lang's top-100 tokens (Zipf 1949; slope ≈ −1 for
    * natural text — a cheap "does this corpus look like language"
    * audit). Ranks are a lang-partitioned WindowGroupLimit over the
    * vocabulary frame; the regression runs on 6-dp-rounded lns held
    * in DECIMAL (order-independent sums, q106's discipline) with the
    * OLS closed form evaluated once per lang.
    */
  def q170ZipfFit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = documents(s, d)
      .select(col("lang"),
        explode(functions.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("lang").orderBy(col("freq").desc, col("tok"))
    val terms = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100) // WindowGroupLimit prunes map-side
      .withColumn("x", round(log(col("rk").cast("double")), 6)
        .cast("decimal(8,6)"))
      .withColumn("y", round(log(col("freq").cast("double")), 6)
        .cast("decimal(8,6)"))
    terms.groupBy("lang")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).cast("decimal(12,6)").as("sx"),
        sum(col("y")).cast("decimal(12,6)").as("sy"),
        sum(col("x") * col("y")).cast("decimal(20,12)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(20,12)").as("sxx"))
      .withColumn("zipf_slope", round(
        (col("n_terms").cast("decimal(3,0)") * col("sxy") -
          col("sx") * col("sy")).cast("double") /
          (col("n_terms").cast("decimal(3,0)") * col("sxx") -
            col("sx") * col("sx")).cast("double"), 6) + lit(0.0))
      .select(col("lang"), col("n_terms"), col("zipf_slope"))
      .orderBy(col("lang"))
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

  // ---------------------------------------------------------------- q61
  /** Edit-distance near-duplicates via suffix-key blocking: documents
    * sharing their last 5 tokens join into small buckets (copies AND
    * drop-first-words mutations share the suffix), then exact
    * `levenshtein` verifies within each bucket — all-pairs cost is
    * bounded by bucket size, never corpus size.
    */
  def q61LevNearDup(s: SparkSession, d: String): DataFrame = {
    val c = dedupCorpus(s, d)
      .withColumn("toks", graft.functions.TextAnalysis.tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .withColumn("suffix_key", expr(
        "array_join(CASE WHEN n >= 5 THEN slice(toks, n - 4, 5) ELSE toks END, ' ')"))
      .select(col("doc_id"), col("text"), col("suffix_key"))
    c.as("a").join(c.as("b"),
        col("a.suffix_key") === col("b.suffix_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("lev", levenshtein(col("a.text"), col("b.text")))
      .filter(col("lev") <= 40)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("lev").cast("long").as("lev"))
      .orderBy(col("id1"), col("id2"))
  }

  // ---------------------------------------------------------------- q48
  /** Exact interpolated percentiles per group via
    * [[operators.Quantiles.exactQuantiles]] — a distributed sort +
    * rank selection, bit-identical to Spark's `percentile` built-in
    * (same `(hi−pos)·v_lo + (pos−lo)·v_hi` interpolation) but with no
    * per-group value buffering: the built-in funnels every value of a
    * group through one reducer, this shape scales like a sort. DuckDB's
    * `quantile_cont` computes the same formula.
    */
  def q48Quantiles(s: SparkSession, d: String): DataFrame =
    operators.Quantiles.exactQuantiles(lineitem(s, d), Seq("l_returnflag"),
        "l_extendedprice", Seq(0.5, 0.9, 0.99))
      .groupBy(col("l_returnflag"))
      .agg(
        round(max(when(col("q") === 0.5, col("quantile"))), 6).as("p50"),
        round(max(when(col("q") === 0.9, col("quantile"))), 6).as("p90"),
        round(max(when(col("q") === 0.99, col("quantile"))), 6).as("p99"),
        max(col("n_values")).as("n"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q49
  /** Multi-level ROLLUP aggregation (subtotals + grand total in one
    * pass — Spark expands grouping sets map-side, no extra scan).
    * Grouping-null keys surface as 'ALL' so the row set is
    * hash-comparable.
    */
  def q49Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

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

  // ---------------------------------------------------------------- q44
  /** As-of (point-in-time) join: every click event gains the same
    * user's most recent view value at-or-before it. The right side is
    * pre-aggregated to one row per (user, ts) — the as-of uniqueness
    * contract. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def q44AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoin(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q45
  /** Banded range join: for every click, count the same user's views
    * within ±5 minutes. The band equi-join bounds fan-out; the oracle is
    * the plain range join (banding must be result-invisible).
    */
  def q45RangeJoin(s: SparkSession, d: String): DataFrame = {
    val fiveMinNs = 300000000000L // ts is nanos since epoch
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    operators.TemporalJoins.bandedRangeJoin(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "view_ts", lower = -fiveMinNs, upper = fiveMinNs)
      .groupBy(col("user_id"), col("event_id"))
      .agg(count(lit(1)).as("n_views_nearby"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q38
  /** Excel (.xlsx) source round-trip: OOXML workbook generated from
    * nation, parsed back by the pure-JDK zip+StAX reader
    * (SURVEY §2.1 Excel scan).
    */
  def q38SrcXlsx(s: SparkSession, d: String): DataFrame = {
    val rows = nation(s, d).orderBy(col("n_nationkey")).collect()
    val data = Seq(Seq("n_nationkey", "n_name", "n_regionkey")) ++
      rows.map(r => Seq(r.getInt(0).toString, r.getString(1), r.getInt(2).toString))
    val f = new java.io.File(sources.SyntheticFixtures.dir("xlsx"), "nation.xlsx")
    sources.SyntheticFixtures.writeXlsx(f, "data", data)
    castNation(sources.XlsxSource.read(s, f.getPath))
  }

  // ---------------------------------------------------------------- q39
  /** ODS source round-trip: content.xml table generated from nation with
    * sheet selection by name (SURVEY §2.1 ODS scan).
    */
  def q39SrcOds(s: SparkSession, d: String): DataFrame = {
    val rows = nation(s, d).orderBy(col("n_nationkey")).collect()
    val data = Seq(Seq("n_nationkey", "n_name", "n_regionkey")) ++
      rows.map(r => Seq(r.getInt(0).toString, r.getString(1), r.getInt(2).toString))
    val f = new java.io.File(sources.SyntheticFixtures.dir("ods"), "nation.ods")
    sources.SyntheticFixtures.writeOds(f, "data", data)
    castNation(sources.OdsSource.read(s, f.getPath, sheetName = Some("data")))
  }

  // ---------------------------------------------------------------- q40
  /** KeePass (.kdbx) source round-trip: entries generated from customers,
    * encrypted into a kdbx 3.1 container (AES-KDF + AES-CBC + hashed
    * block stream + gzip), decrypted and flattened back
    * (SURVEY §2.1 KeePass scan).
    */
  def q40SrcKdbx(s: SparkSession, d: String): DataFrame = {
    val ks = customer(s, d).filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey")).collect()
    val entries = ks.map { r =>
      Map("Title" -> s"cust${r.getLong(0)}", "UserName" -> r.getString(1),
        "Notes" -> r.getString(2))
    }.toSeq
    // entries split across a kdbx 3.1 vault (AES-KDF + Salsa20), a kdbx4
    // Argon2id vault, and a kdbx4 Argon2d vault whose payload spans
    // multiple HMAC blocks — one glob read covers all three container
    // shapes
    val byThree = entries.zipWithIndex.groupBy(_._2 % 3)
    def part(i: Int) = byThree.getOrElse(i, Seq.empty).map(_._1)
    val dir = sources.SyntheticFixtures.dir("kdbx")
    sources.KdbxWriter.write(new java.io.File(dir, "customers_a.kdbx"),
      "abc123", part(0))
    sources.KdbxWriter.write4(new java.io.File(dir, "customers_b.kdbx"),
      "abc123", part(1))
    sources.KdbxWriter.write4(new java.io.File(dir, "customers_c.kdbx"),
      "abc123", part(2),
      argon2Variant = sources.Kdbx4Crypto.Argon2Type.D, blockSize = 96)
    sources.KdbxSource.read(s, new java.io.File(dir, "customers_*.kdbx").getPath,
        "abc123")
      .select(col("Title").as("title"), col("UserName").as("username"),
        col("Notes").as("notes"))
      .orderBy(col("title"))
  }

  // ---------------------------------------------------------------- q42
  /** Legacy Excel (.xls, BIFF8) source round-trip through the native
    * CFB+BIFF reader (SURVEY §2.1 Excel 2003 scan). The glob spans all
    * four workbook protections — plaintext, standard RC4, RC4 CryptoAPI
    * and XOR obfuscation — read in one pass with one password.
    */
  def q42SrcXls(s: SparkSession, d: String): DataFrame = {
    val rows = nation(s, d).orderBy(col("n_nationkey")).collect()
    val header = Seq(Seq("n_nationkey", "n_name", "n_regionkey"))
    val all = rows.map(r => Seq(r.getInt(0).toString, r.getString(1), r.getInt(2).toString))
    val byFour = all.zipWithIndex.toSeq.groupBy(_._2 % 4)
    def part(i: Int) = header ++ byFour.getOrElse(i, Seq.empty).map(_._1)
    val dir = sources.SyntheticFixtures.dir("xls")
    sources.SyntheticFixtures.writeXls(
      new java.io.File(dir, "nation_a.xls"), "data", part(0))
    sources.SyntheticFixtures.writeXls(
      new java.io.File(dir, "nation_b.xls"), "data", part(1),
      password = Some("abc123"))
    sources.SyntheticFixtures.writeXls(
      new java.io.File(dir, "nation_c.xls"), "data", part(2),
      password = Some("abc123"), encryption = "cryptoapi")
    sources.SyntheticFixtures.writeXls(
      new java.io.File(dir, "nation_d.xls"), "data", part(3),
      password = Some("abc123"), encryption = "xor")
    castNation(sources.XlsSource.read(s, new java.io.File(dir, "nation_*.xls").getPath,
      sheetName = Some("data"), password = Some("abc123")))
  }

  // ---------------------------------------------------------------- q41
  /** Skew-mitigated join on a GENUINELY hot key: ~70% of lineitem rows
    * collapse onto skew_key 0 (a real-world "default value" hot key), so
    * the plain shuffle join lands 70% of the fact on ONE reducer. The
    * salted join spreads that key over `saltFactor` reducers and is
    * result-identical — the oracle IS the plain join. The dimension here
    * is broadcastable at test scale; salting is the tool for when it is
    * not (measured salted-vs-plain in PLANS.md).
    */
  def q41SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val fact = lineitem(s, d).select(
      when(col("l_orderkey") % 10 < 7, 0L).otherwise(col("l_orderkey") % 997)
        .as("skew_key"),
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val dim = orders(s, d)
      .select((col("o_orderkey") % 997).as("skew_key")).distinct()
      .withColumn("bucket_mod", col("skew_key") % 5)
    operators.Skew.saltedJoin(fact, dim, keys = Seq("skew_key"),
        saltFactor = 8, saltSource = hash(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("bucket_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("bucket_mod"))
  }

  // ---------------------------------------------------------------- q173
  /** Adamic–Adar link prediction over the ≥2-support co-purchase
    * graph ([[operators.LinkPrediction.adamicAdarTopK]]) — the
    * "which absent edge is most likely" top-50. Eleventh consumer of
    * the shared edge artifact; wedge join bounded by the hub cap
    * (principled for AA: hubs carry the smallest 1/ln weight).
    */
  def q173AdamicAdar(s: SparkSession, d: String): DataFrame =
    operators.LinkPrediction.adamicAdarTopK(
      copurchasePairs(s, d).filter(col("n_both") >= 2)
        .select(col("pa"), col("pb")), "pa", "pb",
      maxWedgeDegree = 10000, topK = 50)
      .select(col("u"), col("v"), col("n_common"),
        col("aa_score").cast("double").as("aa_score"))

  // ---------------------------------------------------------------- q174
  /** Item-item cosine collaborative filtering ("bought X also bought
    * Y", [[operators.LinkPrediction.itemCosineTopK]]): per-item top-3
    * neighbors by co-occurrence cosine. The expensive basket self-join
    * is the shared edge artifact; this stage is two broadcast-size
    * joins + a WindowGroupLimit over pre-aggregated counts.
    */
  def q174ItemCosine(s: SparkSession, d: String): DataFrame = {
    val ic = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .groupBy(col("pk").as("item")).agg(count(lit(1)).as("n"))
    operators.LinkPrediction.itemCosineTopK(
        copurchasePairs(s, d), ic, topKPerItem = 3, minBoth = 2)
      .orderBy(col("item"), col("rk"))
  }

  // ---------------------------------------------------------------- q175
  /** HITS hubs-and-authorities over the bipartite customer→part
    * purchase graph ([[operators.LinkPrediction.hitsTopAuthorities]]),
    * 2 L1-normalized rounds, top-20 authorities — the query-vs-catalog
    * asymmetry PageRank (q83) can't express; oracle unrolls the
    * rounds with the same 6-dp DECIMAL discipline.
    */
  def q175Hits(s: SparkSession, d: String): DataFrame =
    operators.LinkPrediction.hitsTopAuthorities(
      orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("p")),
      "u", "p", rounds = 2, topK = 20)

  // ---------------------------------------------------------------- q176
  /** Chi-square independence of `lang` × `source` on documents
    * ([[operators.Contingency.chiSquareIndependence]]) plus Cramér's V
    * — the categorical-association audit (a crawl where language
    * depends strongly on source is fine; a LABEL that depends on
    * source is leakage). Full-grid zero cells included; 6-dp DECIMAL
    * term sums.
    */
  def q176ChiSquare(s: SparkSession, d: String): DataFrame =
    operators.Contingency.chiSquareIndependence(
      documents(s, d), "lang", "source")

  // ---------------------------------------------------------------- q177
  /** Per-event-type Spearman rank correlation of value vs time
    * ([[operators.Spearman.correlation]]) — the monotone-drift screen
    * (is `value` trending within each event type?). Midranks from the
    * distinct-value frame + distributed two-pass prefix sum; exact
    * 2·rank integers; one float op per group.
    */
  def q177Spearman(s: SparkSession, d: String): DataFrame =
    operators.Spearman.correlation(events(s, d), "event_type", "value", "ts")
      .select(col("group").as("event_type"), col("n"), col("rho"))
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q178
  /** Exact dyadic EWMA (α = 1/2, trailing 8) of per-user event value
    * cents ordered by (ts, event_id) ([[operators.Ewma.dyadicEwma]]):
    * power-of-two weights make the smoothed series exact integer
    * arithmetic — bit-portable, unlike recursive float EWMA. Users
    * < 100 keep the output row count bounded.
    */
  def q178Ewma(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).filter(col("user_id") < 100)
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("__ord", struct(col("us"), col("event_id")))
    operators.Ewma.dyadicEwma(ev, "user_id", "__ord", "cents", window = 8)
      .select(col("user_id"), col("event_id"), col("us"), col("cents"),
        col("ewma"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  // ---------------------------------------------------------------- q179
  /** TextRank keyword extraction per language
    * ([[operators.TextRank.keywords]]): PageRank over the token
    * adjacency graph, 2 rounds, top-10 — structural keywords, not
    * merely frequent tokens. Edge weights from ONE explode + hash agg;
    * per round one edge-keyed join + one hash agg.
    */
  def q179TextRank(s: SparkSession, d: String): DataFrame =
    operators.TextRank.keywords(
        documents(s, d).select(col("lang"),
          functions.TextAnalysis.tokens(col("text")).as("toks")),
        "lang", "toks", rounds = 2, minEdgeCount = 3, topK = 10)
      .select(col("group").as("lang"), col("token"), col("rank_score"),
        col("rk"))
      .orderBy(col("lang"), col("rk"))

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

  // ---------------------------------------------------------------- q181
  /** Bounded Bellman–Ford shortest paths
    * ([[operators.Sssp.boundedShortestPaths]]) on the ≥2-support
    * co-purchase graph, edge cost `round(1/n_both, 6)` (strong ties =
    * short), seeds = part ids ≤ 50, 4 relaxation rounds — the weighted
    * complement of q144's hop-count BFS. DECIMAL distances end to end.
    */
  def q181Sssp(s: SparkSession, d: String): DataFrame = {
    val sup = copurchasePairs(s, d).filter(col("n_both") >= 2)
    val half = sup.select(col("pa").cast("long").as("u"),
      col("pb").cast("long").as("v"),
      round(lit(1.0) / col("n_both").cast("double"), 6)
        .cast("decimal(12,6)").as("w"))
    val e = half.unionAll(half.select(col("v").as("u"), col("u").as("v"),
      col("w")))
    val seeds = e.select(col("u")).filter(col("u") <= 50).distinct()
    operators.Sssp.boundedShortestPaths(e, "u", "v", "w", seeds, rounds = 4)
      .select(col("node"), col("dist").cast("double").as("dist"))
      .orderBy(col("node"))
  }

  // ---------------------------------------------------------------- q182
  /** Cohen's kappa between the n-gram language-ID heuristic (q20) and
    * the gold `lang` column ([[operators.Contingency.cohenKappa]]) —
    * the chance-corrected classifier-agreement readout (raw accuracy
    * flatters any skewed label mix). Integer-exact through κ's
    * cleared-denominator form; one float divide.
    */
  def q182Kappa(s: SparkSession, d: String): DataFrame =
    operators.Contingency.cohenKappa(
      documents(s, d).select(
        functions.TextAnalysis.langId(col("text")).as("pred"),
        col("lang")),
      "pred", "lang")

  // ---------------------------------------------------------------- q183
  /** Per-event-type skewness / excess kurtosis from exact integer
    * power sums ([[operators.Moments.shape]]) — the tail-shape drift
    * audit mean/variance monitoring misses. One hash agg; closed
    * forms run once per group on exact sums.
    */
  def q183Moments(s: SparkSession, d: String): DataFrame =
    operators.Moments.shape(
        events(s, d).select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")),
        "event_type", "cents")
      .withColumnRenamed("group", "event_type")
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q184
  /** Per-source language-diversity indices: Shannon entropy (6-dp
    * DECIMAL term sums) and Gini–Simpson as an exact ppm integer —
    * the mix-health audit for a multi-source corpus (a "diverse"
    * source that is 99% one language is a labeling bug or a crawl
    * trap). Two hash aggs over the (source, lang) cell frame.
    */
  def q184Diversity(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy("source", "lang")
      .agg(count(lit(1)).as("nl"))
    val tot = cells.groupBy("source")
      .agg(sum(col("nl")).as("n"), count(lit(1)).as("k"),
        sum(col("nl") * col("nl")).as("sl2"))
    cells.join(tot, Seq("source"))
      .withColumn("term",
        round(-(col("nl").cast("double") / col("n").cast("double")) *
          log(col("nl").cast("double") / col("n").cast("double")), 6)
          .cast("decimal(10,6)"))
      .groupBy(col("source"), col("n").as("n_docs"), col("k").as("n_langs"),
        col("sl2"))
      .agg(sum(col("term")).cast("decimal(18,6)").as("sh"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("sh").cast("double").as("shannon"),
        expr("1000000 - (sl2 * 1000000) DIV (n_docs * n_docs)")
          .as("simpson_ppm"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q185
  /** Partition-balance audit: rows per md5-derived bucket (the
    * engine-portable stand-in for a 32-way hash partitioning) plus
    * the max-over-average ratio in exact ppm — the pre-flight skew
    * check before keying a 100 TB shuffle on a candidate column.
    */
  def q185PartitionBalance(s: SparkSession, d: String): DataFrame = {
    val b = documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 32)
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    b.agg(sum(col("n_rows")).as("n"),
        count(lit(1)).as("n_buckets"),
        min(col("n_rows")).as("min_rows"),
        max(col("n_rows")).as("max_rows"))
      .select(col("n"), col("n_buckets"), col("min_rows"), col("max_rows"),
        expr("(max_rows * n_buckets * 1000000) DIV n").as("max_over_avg_ppm"))
  }

  // ---------------------------------------------------------------- q186
  /** Simplified silhouette per embedding label
    * ([[operators.Silhouette.byLabelCentroids]]) — the cluster-quality
    * readout at O(n·k·d) (centroid-based, the form that scales; the
    * exact pairwise silhouette is O(n²·d)). DECIMAL components and
    * squared distances; sqrt + ratio are the only float ops.
    */
  def q186Silhouette(s: SparkSession, d: String): DataFrame =
    operators.Silhouette.byLabelCentroids(
        embeddings(s, d), "vec_id", "label", "embedding")
      .orderBy(col("label"))

  // ---------------------------------------------------------------- q187
  /** JL signed-projection retrieval eval: project embeddings to 16
    * dims ([[operators.RandomProjection.projectSigned]]), run top-10
    * by projected cosine, and measure recall@10 against the exact
    * top-10 (q26's brute-force face) — the dimension-reduction
    * quality gate before committing a 100 TB corpus to a cheaper
    * index. Exact-integer recall in ppm.
    */
  def q187JlRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
    val proj = operators.RandomProjection.projectSigned(
      e, "vec_id", "embedding", outDims = 16)
    val n2 = proj.groupBy("id")
      .agg(sum((col("p") * col("p")).cast("decimal(34,12)"))
        .cast("decimal(38,12)").as("n2"))
    val pq = proj.filter(col("id") < 10)
    val pc = proj.filter(col("id") >= 10)
    val dot = pq.as("q").join(pc.as("c"), col("q.pdim") === col("c.pdim"))
      .groupBy(col("q.id").as("query_id"), col("c.id").as("cand_id"))
      .agg(sum((col("q.p") * col("c.p")).cast("decimal(34,12)"))
        .cast("decimal(38,12)").as("dot"))
    val cosf = dot
      .join(n2.select(col("id").as("query_id"), col("n2").as("nq")), Seq("query_id"))
      .join(n2.select(col("id").as("cand_id"), col("n2").as("nc")), Seq("cand_id"))
      .filter(col("nq").cast("double") > 0.0 && col("nc").cast("double") > 0.0)
      .withColumn("cosp", round(col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))), 6))
    val wA = Window.partitionBy("query_id").orderBy(col("cosp").desc, col("cand_id"))
    val approx = cosf.withColumn("rk", row_number().over(wA))
      .filter(col("rk") <= 10).select(col("query_id"), col("cand_id"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = operators.Similarity
      .bruteForceTopK(queries, e.filter(col("vec_id") >= 10), k = 10)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(approx,
        approx("query_id") === exact("query_id") &&
          approx("cand_id") === exact("neighbor_id"), "left")
      .groupBy(exact("query_id").as("query_id"))
      .agg(count(col("cand_id")).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        (col("n_hit") * 100000).as("recall_ppm"))
      .orderBy(col("query_id"))
  }

  // ---------------------------------------------------------------- q188
  /** Declarative data-quality constraint audit
    * ([[operators.Constraints.audit]]): NOT NULL / UNIQUE / range /
    * domain / referential integrity over the star schema in one
    * report — the pre-promotion gate a pipeline runs before a
    * snapshot goes live. Each per-row check is one scan-stage
    * aggregation; referential checks are key-only anti joins.
    */
  def q188ConstraintAudit(s: SparkSession, d: String): DataFrame = {
    import operators.Constraints._
    val c = customer(s, d)
    val o = orders(s, d)
    val l = lineitem(s, d)
    audit(Seq(
      Check("customer_custkey_not_null", "customer",
        notNull(c, "c_custkey")),
      Check("customer_custkey_unique", "customer",
        unique(c, Seq("c_custkey"))),
      Check("customer_acctbal_range", "customer",
        inRange(c, "c_acctbal", lit(-1000.0), lit(10000.0))),
      Check("customer_mktsegment_domain", "customer",
        inSet(c, "c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY"))),
      Check("orders_custkey_ref_customer", "orders",
        refIntegrity(o, "o_custkey", c, "c_custkey")),
      Check("lineitem_orderkey_ref_orders", "lineitem",
        refIntegrity(l, "l_orderkey", o, "o_orderkey")),
      Check("orders_totalprice_range", "orders",
        inRange(o, "o_totalprice", lit(1.0), lit(1000000.0)))))
  }

  // ---------------------------------------------------------------- q189
  /** Apriori level-3: frequent triple itemsets grown from the ≥5-
    * support pair frame (twelfth consumer of the shared edge
    * artifact) — candidate triples only extend already-frequent
    * pairs, the pruning that makes level-k mining feasible at scale.
    * Exact integer supports; top-20. Thresholds (pair ≥ 2,
    * triple ≥ 2): a support-1 "itemset" is raw enumeration, not
    * mining — at sf0.1 the synthetic baskets never repeat a triple,
    * so the empty result there is the honest answer (the sf0.01
    * gate returns rows).
    */
  def q189TripleItemsets(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val fp = copurchasePairs(s, d).filter(col("n_both") >= 2)
      .select(col("pa"), col("pb"))
    val pairOrders = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.ok").as("ok"), col("a.pk").as("pa"), col("b.pk").as("pb"))
      .join(fp, Seq("pa", "pb")) // Apriori prune BEFORE the 3rd expansion
    val triples = pairOrders.join(li.as("c"),
        col("c.ok") === pairOrders("ok") && col("c.pk") > col("pb"))
      .groupBy(col("pa"), col("pb"), col("c.pk").as("pc"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
    triples.orderBy(col("support").desc, col("pa"), col("pb"), col("pc"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q190
  /** Signup→purchase conversion-delay quantiles by signup weekday —
    * time-to-event percentiles over exact integer-µs delays; the
    * funnel-latency readout q80's fixed-window conversion rate can't
    * give. Type-1 DISCRETE quantiles (value at rank ceil(q·n)), not
    * interpolated: at 1e11-µs magnitudes a double's ulp (~3e-5)
    * exceeds 6-dp rounding, so interpolation arithmetic diverges
    * across engines in the last ulp — rank selection is pure integer
    * work (the one float op, ceil(q·n), is the same IEEE multiply on
    * both sides). Ranks via the distributed ordinal; no window.
    */
  def q190ConversionDelay(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val sign = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("sts"))
    val first = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
      .join(sign, Seq("user_id")).filter(col("pts") >= col("sts"))
      .groupBy(col("user_id"), col("sts")).agg(min(col("pts")).as("pts"))
    val delays = first.select(
      expr("((sts DIV 86400000000000) + 4) % 7").as("wd"), // 1970-01-01=Thu
      expr("(pts - sts) DIV 1000").as("delay_us"))
    val ranked = operators.Ordinals.withOrderedOrdinal(delays,
      Seq(col("wd"), col("delay_us")), "__rn")
    val base = ranked.groupBy("wd")
      .agg(min(col("__rn")).as("b"), count(lit(1)).as("n"))
    val targets = base.withColumn("q",
        explode(array(lit(0.5), lit(0.9), lit(0.99))))
      .withColumn("r", ceil(col("q") * col("n")).cast("long"))
    ranked.as("rk").join(broadcast(targets.as("t")),
        col("rk.wd") === col("t.wd") &&
          col("rk.__rn") - col("t.b") + 1 === col("t.r"))
      .groupBy(col("t.wd").as("wd"))
      .agg(max(when(col("q") === 0.5, col("delay_us"))).as("p50_us"),
        max(when(col("q") === 0.9, col("delay_us"))).as("p90_us"),
        max(when(col("q") === 0.99, col("delay_us"))).as("p99_us"),
        max(col("n")).as("n"))
      .orderBy(col("wd"))
  }

  // ---------------------------------------------------------------- q191
  /** Label-noise screen via kNN disagreement (Confident-Learning-
    * style): each probe vector's label vs the majority label of its 5
    * exact nearest neighbors — embeddings whose neighborhood outvotes
    * their label are mislabeling candidates. Broadcast probe set; the
    * corpus is never shuffled.
    */
  def q191LabelNoise(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
    val probes = e.filter(col("vec_id") < 200)
    val nn = operators.Similarity.bruteForceTopK(
      probes.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec")),
      e.filter(col("vec_id") >= 200), k = 5)
    val votes = nn.join(e.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), Seq("neighbor_id"))
      .groupBy("query_id", "nl").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("query_id").orderBy(col("c").desc, col("nl"))
    val maj = votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("nl").as("majority_label"),
        col("c").as("n_votes"))
    probes.select(col("vec_id").as("query_id"), col("label").as("own_label"))
      .join(maj, Seq("query_id"))
      .withColumn("mismatch", col("own_label") =!= col("majority_label"))
      .orderBy(col("query_id"))
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

  // ---------------------------------------------------------------- q193
  /** Per-source duplication involvement: the fraction of each source's
    * docs that sit in at least one verified near-dup pair (13th
    * consumer of the shared PPJoin pair artifact) — the crawl-trap
    * detector (a source whose docs are mostly near-dups of something
    * is a mirror or a template farm). Exact ppm.
    */
  def q193SourceDupRate(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    val dupDocs = dedupPairs(s, d).select(col("id1").as("id"))
      .unionAll(dedupPairs(s, d).select(col("id2").as("id")))
      .select(pmod(col("id"), lit(1000000L)).as("doc_id")).distinct()
    val perSrc = src.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val dupPerSrc = dupDocs.join(src, Seq("doc_id"))
      .groupBy("source").agg(count(lit(1)).as("n_dup"))
    perSrc.join(dupPerSrc, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_involved"),
        expr("(coalesce(n_dup, 0) * 1000000) DIV n_docs").as("dup_ppm"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q194
  /** Inter-arrival burstiness per event type (Goh & Barabási 2008:
    * B = (σ−μ)/(σ+μ) over inter-event gaps; 0 = Poisson, →1 = bursty,
    * →−1 = periodic) — the traffic-shape audit distinguishing human
    * sessions from synthetic feeds. Gaps per (user, type) stream via
    * one partitioned lag; moments are exact DECIMAL power sums; one
    * float closed form per type.
    */
  def q194Burstiness(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us"), col("event_id"))
    val gaps = events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("gap").cast("decimal(19,0)")).cast("decimal(20,0)").as("s1"),
        // (19,0) operands force the int128 decimal class in BOTH
        // engines — DuckDB's width-18 int64 fast path overflows on
        // multi-day gaps squared
        sum((col("gap").cast("decimal(19,0)") *
          col("gap").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .cast("decimal(34,0)").as("s2"))
      .withColumn("__mu", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("__sd", sqrt(col("s2").cast("double") /
        col("n").cast("double") - col("__mu") * col("__mu")))
      .select(col("event_type"), col("n"),
        // exact integer mean: at 1e11-µs magnitudes round(x,6) sits
        // below the double ulp and diverges across engines
        expr("CAST(s1 AS BIGINT) DIV n").as("mean_gap_us"),
        when(col("__sd") + col("__mu") === 0.0, lit(null).cast("double"))
          .otherwise(round((col("__sd") - col("__mu")) /
            (col("__sd") + col("__mu")), 6) + lit(0.0)).as("burstiness"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q195
  /** Near-dup cluster-size histogram (14th consumer of the shared
    * pair/label artifacts): how much of the corpus sits in pairs,
    * triangles, bigger mirror farms — the shape that decides whether
    * keep-one dedup or domain blocking is the right response.
    */
  def q195ClusterHistogram(s: SparkSession, d: String): DataFrame =
    operators.ConnectedComponents.clustersFromLabels(dedupLabels(s, d))
      .groupBy("cluster_size")
      .agg(count_distinct(col("cluster")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("cluster_size"))

  // ---------------------------------------------------------------- q196
  /** Embedding hygiene gate: per label, zero/near-zero/oversized
    * vector counts from DECIMAL-exact squared norms (the 6-dp
    * component quantization q186 uses) — degenerate vectors poison
    * cosine retrieval silently, so they get counted before any index
    * is built. One explode + two hash aggs.
    */
  def q196VectorHygiene(s: SparkSession, d: String): DataFrame = {
    val n2 = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xd", col("x").cast("double").cast("decimal(12,6)"))
      .groupBy("vec_id", "label")
      .agg(sum((col("xd") * col("xd")).cast("decimal(27,12)"))
        .cast("decimal(32,12)").as("n2"))
    n2.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("n2") === 0, 1L).otherwise(0L)).as("n_zero"),
        // exact DECIMAL thresholds — a double-literal compare would
        // promote n2 to double and wobble at the boundary
        sum(when(col("n2") > 0 &&
            col("n2") < expr("CAST(0.01 AS DECIMAL(32,12))"), 1L)
          .otherwise(0L)).as("n_tiny"),
        sum(when(col("n2") > expr("CAST(100 AS DECIMAL(32,12))"), 1L)
          .otherwise(0L)).as("n_oversized"))
      .orderBy(col("label"))
  }

  // ---------------------------------------------------------------- q197
  /** Quality-decile × duplication cross-signal: docs ranked into
    * deciles by the q19 quality score (distributed ordinal, no global
    * window), each decile's near-dup involvement in exact ppm — the
    * "is low-quality text also the duplicated text" readout that
    * decides whether dedup subsumes quality filtering. 15th pair-
    * artifact consumer.
    */
  def q197QualityDupDeciles(s: SparkSession, d: String): DataFrame = {
    val scored = documents(s, d).select(col("doc_id"),
      functions.TextAnalysis.qualityScore(col("text")).as("q"))
    val ranked = operators.Ordinals.withOrderedOrdinal(scored,
      Seq(col("q"), col("doc_id")), "__rn")
    val n = ranked.count() // one scalar action; decile arithmetic is DIV
    val dec = ranked.withColumn("decile",
      expr(s"((__rn - 1) * 10) DIV $n + 1"))
    val dupDocs = dedupPairs(s, d).select(col("id1").as("id"))
      .unionAll(dedupPairs(s, d).select(col("id2").as("id")))
      .select(pmod(col("id"), lit(1000000L)).as("doc_id")).distinct()
      .withColumn("dup", lit(1L))
    dec.join(dupDocs, Seq("doc_id"), "left")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
      .withColumn("dup_ppm", expr("(n_dup * 1000000) DIV n_docs"))
      .orderBy(col("decile"))
  }

  // ---------------------------------------------------------------- q198
  /** Purchase-weekday seasonality: chi-square independence of part ×
    * order-weekday over the top-10 parts (one
    * [[operators.Contingency.chiSquareIndependence]] call) — "do the
    * popular items sell on different days?". Weekday from portable
    * epoch-day arithmetic (both engines' dayofweek conventions
    * differ); top-10 by distinct order count, ties on part id.
    */
  def q198Seasonality(s: SparkSession, d: String): DataFrame = {
    val rows = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .join(orders(s, d).select(col("o_orderkey").as("ok"),
        ((datediff(col("o_orderdate"), lit("1970-01-01")) + 4) % 7)
          .cast("long").as("wd")), Seq("ok"))
    val top = rows.groupBy("pk").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pk")).limit(10).select(col("pk"))
    operators.Contingency.chiSquareIndependence(
      rows.join(broadcast(top), Seq("pk")), "pk", "wd")
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

  // ---------------------------------------------------------------- q201
  /** Right-to-be-forgotten cascade audit: a forget-list of customers
    * (c_custkey % 97 == 0) propagated through orders and lineitem by
    * key-only anti joins — the per-table survivor/removed counts a
    * GDPR deletion run must report before committing. Anti joins
    * carry only the key column; the cascade is two hops (customer →
    * orders → lineitem), never a multi-way join.
    */
  def q201ForgetCascade(s: SparkSession, d: String): DataFrame = {
    val forget = customer(s, d).filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("k"))
    val c = customer(s, d)
    val o = orders(s, d)
    val l = lineitem(s, d)
    val oKeep = o.join(forget, o("o_custkey") === forget("k"), "left_anti")
    val okKeep = oKeep.select(col("o_orderkey").as("k2"))
    val lKeep = l.join(okKeep, l("l_orderkey") === okKeep("k2"), "left_semi")
    def row(name: String, total: DataFrame, kept: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total")).crossJoin(
        broadcast(kept.agg(count(lit(1)).as("n_kept"))))
        .select(lit(name).as("table_name"), col("n_total"), col("n_kept"),
          (col("n_total") - col("n_kept")).as("n_removed"))
    row("customer", c,
        c.join(forget, c("c_custkey") === forget("k"), "left_anti"))
      .unionAll(row("orders", o, oKeep))
      .unionAll(row("lineitem", l, lKeep))
      .orderBy(col("table_name"))
  }

  // ---------------------------------------------------------------- q202
  /** Top user journeys: the 20 most common 3-event type sequences
    * (consecutive by time within a user) — the product-analytics
    * "what do people actually do" readout behind funnel design. Two
    * leads in ONE user-partitioned window pass; exact counts.
    */
  def q202JourneyTrigrams(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q203
  /** Transition dwell times: for each (from → to) consecutive event-
    * type pair, the exact integer-µs mean and max gap — q112's
    * transition PROBABILITIES with the time dimension added (how long
    * do users sit between steps). One lead window; DIV means.
    */
  def q203TransitionDwell(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("us2", lead(col("us"), 1).over(w))
      .filter(col("t2").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("t2").as("to_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("us2") - col("us")).cast("decimal(19,0)"))
          .cast("decimal(20,0)").as("gap_sum"),
        max(col("us2") - col("us")).as("max_gap_us"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("CAST(gap_sum AS BIGINT) DIV n").as("mean_gap_us"),
        col("max_gap_us"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // ---------------------------------------------------------------- q204
  /** The NATIVE as-of join ([[graft.plans.AsofJoinExec]] — custom
    * logical node + planner strategy + sort-merge physical operator)
    * on q44's exact query, against the same DuckDB `ASOF LEFT JOIN`
    * oracle: the whole-operator Catalyst extension path verified
    * end-to-end. One merge pass over co-clustered (key, time)-sorted
    * children — no union, no window, no second materialization of the
    * probe side.
    */
  def q204AsofNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    graft.plans.AsofJoinNative.asof(clicks, views,
        Seq("user_id"), Seq("v_user"), "ts", "v_ts")
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q205
  /** Watermark sizing audit: per event type, how far out-of-order the
    * stream actually arrives — lateness = running max(event time in
    * arrival order) − event time. The number that SIZES a streaming
    * job's `withWatermark` delay: too small drops the tail, too large
    * holds state. Arrival order = event_id (the generator's ingest
    * sequence); exact integer µs. On the synthetic feed the answer is
    * all-zeros — the generator emits in timestamp order — which is
    * the audit PASSING (watermark delay 0 suffices), not a gap: the
    * machinery is what the oracle verifies, and real ingest is where
    * the numbers go nonzero.
    */
  def q205WatermarkSizing(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("us"))
      .withColumn("late", greatest(max(col("us")).over(w) - col("us"), lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("late") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late")).as("max_late_us"),
        sum(col("late").cast("decimal(19,0)")).cast("decimal(20,0)")
          .as("__ls"))
      .select(col("event_type"), col("n"), col("n_late"),
        col("max_late_us"),
        expr("CAST(__ls AS BIGINT) DIV n").as("mean_late_us"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q206
  /** Dedup survivorship audit: after the quality-canonical election
    * (q104), no two SURVIVORS may still be near-dups of each other —
    * the self-validation a dedup pass ships with its output. One
    * semi-join of the pair artifact against the survivor set from
    * both ends; the invariant holds exactly when n_residual_pairs = 0
    * (pairs are intra-cluster by construction and each cluster keeps
    * one member). 16th consumer of the shared artifacts.
    */
  def q206SurvivorAudit(s: SparkSession, d: String): DataFrame = {
    val survivors = operators.ConnectedComponents
      .keepBestFromLabels(
        dedupCorpus(s, d).withColumn("quality",
          functions.TextAnalysis.qualityScore(col("text"))),
        "doc_id", "quality", dedupLabels(s, d))
      .filter(col("keep"))
      .select(col("doc_id").as("sid"))
    val pairs = dedupPairs(s, d)
    val residual = pairs
      .join(survivors.select(col("sid").as("id1")), Seq("id1"), "left_semi")
      .join(survivors.select(col("sid").as("id2")), Seq("id2"), "left_semi")
    survivors.agg(count(lit(1)).as("n_survivors"))
      .crossJoin(broadcast(residual.agg(count(lit(1)).as("n_residual_pairs"))))
      .withColumn("invariant_holds", col("n_residual_pairs") === 0L)
  }

  // ---------------------------------------------------------------- q207
  /** Streaming windowed stats drained through the REAL Structured
    * Streaming engine and hash-compared against the batch oracle —
    * until now streaming was verified only by self-parity pins; this
    * row makes the `StreamingImport.windowedEventStats` path (micro-
    * batch execution, state store, watermark plumbing) answer to
    * DuckDB exactly like every batch operator. The events table is
    * staged to parquet, replayed as a multi-micro-batch file stream
    * (maxFilesPerTrigger), windowed+watermarked, and the memory sink's
    * COMPLETE-mode output (complete, not append: the trailing window
    * would otherwise be withheld waiting for a watermark that never
    * advances past end-of-stream) is returned as a batch frame.
    * Value sums run in DECIMAL pre-aggregation for engine-portable
    * doubles (FP sum order differs between engines).
    */
  def q207StreamWindows(s: SparkSession, d: String): DataFrame = {
    streaming.StreamingImport.configureStateStore(s) // GRAFT_STREAM_STATE=rocksdb opt-in
    val tmp = java.nio.file.Files.createTempDirectory("graft-q207-")
    val src = tmp.resolve("src").toString
    events(s, d)
      .select(timestamp_micros(expr("ts DIV 1000")).as("ts_utc"),
        col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))
      .repartition(8).write.mode("overwrite").parquet(src)
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
    val agg = streaming.StreamingImport.windowedEventStats(
      stream, "ts_utc", "1 hour", "10 minutes", Seq("event_type"))
    // unique sink/checkpoint per invocation: Bench's min-of-N protocol
    // reruns every query in one session
    val sink = s"q207_sink_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(sink)
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
      .select(col("window_start"), col("event_type"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
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

  // ---------------------------------------------------------------- q210
  /** Streaming cross-batch keyed dedup drained through the REAL
    * engine: events replayed as a multi-micro-batch file stream
    * through [[streaming.StreamingImport.dedupStream]]
    * (`flatMapGroupsWithState`, one boolean per key in the state
    * store), then the surviving KEY SET is hash-compared against
    * DuckDB's `SELECT DISTINCT`. Which event survives per key is
    * arrival-order dependent (partition scheduling), so the oracle
    * checks the order-invariant contract: exactly one row per key,
    * no key lost or invented across micro-batches.
    */
  def q210StreamDedup(s: SparkSession, d: String): DataFrame = {
    streaming.StreamingImport.configureStateStore(s) // GRAFT_STREAM_STATE=rocksdb opt-in
    val tmp = java.nio.file.Files.createTempDirectory("graft-q210-")
    val src = tmp.resolve("src").toString
    events(s, d).select(col("user_id"), col("event_id"))
      .repartition(8).write.mode("overwrite").parquet(src)
    import s.implicits._
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .select(col("user_id").as("_1"), col("event_id").as("_2"))
      .as[(Long, Long)]
    val dedup = streaming.StreamingImport
      .dedupStream[Long, (Long, Long)](stream, _._1)
      .toDF("user_id", "event_id")
    val sink = s"q210_sink_${System.nanoTime()}"
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName(sink)
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink).select(col("user_id")).orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q211
  /** Streaming SESSION windows drained through the real engine — the
    * q43 gaps-and-islands oracle replayed against
    * [[streaming.StreamingImport.sessionEventStats]] running in
    * micro-batches (session-merging state store): inactivity-gap
    * sessions must come out identical whether computed in batch or
    * accumulated incrementally across triggers. Complete output mode
    * for the same end-of-stream reason as q207.
    */
  def q211StreamSessions(s: SparkSession, d: String): DataFrame = {
    streaming.StreamingImport.configureStateStore(s) // GRAFT_STREAM_STATE=rocksdb opt-in
    val tmp = java.nio.file.Files.createTempDirectory("graft-q211-")
    val src = tmp.resolve("src").toString
    events(s, d)
      .select(timestamp_micros(expr("ts DIV 1000")).as("ts_utc"),
        col("user_id"),
        col("value").cast("decimal(18,6)").as("value"))
      .repartition(8).write.mode("overwrite").parquet(src)
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
    // session windows filter watermark-late input even in complete
    // mode (unlike plain windowed aggs), and a parquet REPLAY arrives
    // in file order, not time order — the watermark must exceed the
    // replay's max disorder, which for a historical table is its full
    // span. (That is the documented operator contract, not a dodge:
    // q205 is the audit that SIZES this number for live streams.)
    val agg = streaming.StreamingImport.sessionEventStats(
      stream, "ts_utc", "30 minutes", "730 days", Seq("user_id"))
    val sink = s"q211_sink_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(sink)
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
      .select(col("session_start"), col("user_id"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // ---------------------------------------------------------------- q212
  /** APPEND-mode streaming windows — the third streaming engine
    * contract after q207 (complete-mode aggregation state) and q211
    * (session merging): append emits a window ONLY once the watermark
    * passes its end and then never revisits it, so the drained output
    * must equal the batch aggregation RESTRICTED to windows with
    * `window_end <= max(event time)` (delay 0) — the trailing window
    * stays withheld forever. To make watermark progression
    * deterministic the replay is staged month-by-month (one file per
    * month, strictly increasing mtimes, one file per trigger): months
    * are time-disjoint, so the watermark carried from batch N−1 never
    * classifies a batch-N row late, with zero delay and no span-sized
    * watermark crutch.
    */
  def q212StreamAppend(s: SparkSession, d: String): DataFrame = {
    streaming.StreamingImport.configureStateStore(s) // GRAFT_STREAM_STATE=rocksdb opt-in
    val tmp = java.nio.file.Files.createTempDirectory("graft-q212-")
    val src = tmp.resolve("src")
    java.nio.file.Files.createDirectories(src)
    val ev = events(s, d)
      .select(timestamp_micros(expr("ts DIV 1000")).as("ts_utc"),
        col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))
    val months = ev.select(date_trunc("month", col("ts_utc")).as("m"))
      .distinct().orderBy(col("m"))
      .collect().map(_.getTimestamp(0)) // bounded: one row per month
    months.zipWithIndex.foreach { case (m, i) =>
      ev.filter(date_trunc("month", col("ts_utc")) === lit(m))
        .coalesce(1).write.mode("overwrite")
        .parquet(src.resolve(f"m$i%03d").toString)
      Thread.sleep(25) // strictly increasing mtimes drive file order
    }
    val schema = s.read.parquet(src.resolve("m000").toString).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString + "/m*")
    val agg = streaming.StreamingImport.windowedEventStats(
      stream, "ts_utc", "1 hour", "0 seconds", Seq("event_type"))
    val sink = s"q212_sink_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(sink)
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
      .select(col("window_start"), col("event_type"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  // ---------------------------------------------------------------- q213
  /** STREAM-STREAM interval join drained through the real engine —
    * the two-sided join state store, the last big streaming path
    * without an oracle row: clicks and views replayed as two file
    * streams, inner-joined on user with `view_ts ∈ [click_ts ± 5min]`
    * ([[streaming.StreamingImport.intervalJoinStreams]]), pairs
    * drained and THEN aggregated in batch to per-click nearby-view
    * counts — the q45 shape. An inner stream-stream join emits each
    * matching pair exactly once regardless of arrival interleaving
    * (watermark only bounds state retention, sized here to the replay
    * span), so the drained pair SET is deterministic even though the
    * replay order is not. Users < 300 keep the drained pair table
    * driver-memory-sized.
    */
  def q213StreamIntervalJoin(s: SparkSession, d: String): DataFrame = {
    streaming.StreamingImport.configureStateStore(s) // GRAFT_STREAM_STATE=rocksdb opt-in
    val tmp = java.nio.file.Files.createTempDirectory("graft-q213-")
    val ev = events(s, d).filter(col("user_id") < 300)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_utc").as("c_ts"))
      .repartition(4).write.mode("overwrite")
      .parquet(tmp.resolve("clicks").toString)
    ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_utc").as("v_ts"))
      .repartition(4).write.mode("overwrite")
      .parquet(tmp.resolve("views").toString)
    def rd(name: String) = s.readStream
      .schema(s.read.parquet(tmp.resolve(name).toString).schema)
      .option("maxFilesPerTrigger", "2").parquet(tmp.resolve(name).toString)
    val joined = streaming.StreamingImport.intervalJoinStreams(
      rd("clicks"), rd("views"), "user_id", "v_user", "c_ts", "v_ts",
      delay = "730 days", lowerBoundS = -300L, upperBoundS = 300L)
    val sink = s"q213_sink_${System.nanoTime()}"
    val q = joined.select(col("user_id"), col("event_id"))
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
      .groupBy(col("user_id"), col("event_id"))
      .agg(count(lit(1)).as("n_views_nearby"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q214
  /** The STREAMING IMPORT flagship drained against an oracle: monthly
    * per-user aggregates staged as one file per month (strictly
    * increasing mtimes, one file per trigger — the q212 discipline)
    * and folded through [[streaming.StreamingImport.mergeEachBatch]]
    * (`foreachBatch` + the full importMerge matrix, Upsert ×
    * UpdateAllJoin) into a running target. Each batch carries at most
    * one row per key, so the cross-batch semantics under test — later
    * months overwrite, unseen users insert — are deterministic: the
    * final target is every user's LATEST month row, which DuckDB
    * replays as an argmax-by-month join.
    */
  def q214StreamUpsert(s: SparkSession, d: String): DataFrame = {
    streaming.StreamingImport.configureStateStore(s) // GRAFT_STREAM_STATE=rocksdb opt-in
    val tmp = java.nio.file.Files.createTempDirectory("graft-q214-")
    val src = tmp.resolve("src")
    java.nio.file.Files.createDirectories(src)
    val monthly = events(s, d)
      .withColumn("m", date_trunc("month",
        timestamp_micros(expr("ts DIV 1000"))))
      .groupBy(col("user_id"), col("m"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
    val months = monthly.select(col("m")).distinct().orderBy(col("m"))
      .collect().map(_.getTimestamp(0)) // bounded: one row per month
    months.zipWithIndex.foreach { case (m, i) =>
      monthly.filter(col("m") === lit(m)).coalesce(1)
        .write.mode("overwrite").parquet(src.resolve(f"m$i%03d").toString)
      Thread.sleep(25)
    }
    val schema = s.read.parquet(src.resolve("m000").toString).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString + "/m*")
    var target = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val w = streaming.StreamingImport.mergeEachBatch(stream,
      keys = Seq("user_id"),
      loadTarget = () => target,
      saveTarget = merged => { target = merged.localCheckpoint(true) })
    val q = w.option("checkpointLocation", tmp.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    target.orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q215
  /** Mutual information (nats) between document language and source
    * ([[operators.Contingency.mutualInformation]]) — the
    * feature-association screen in comparable units ("how much does
    * knowing the source tell you about the language"), complementing
    * q176's chi-square on the same table.
    */
  def q215MutualInfo(s: SparkSession, d: String): DataFrame =
    operators.Contingency.mutualInformation(documents(s, d), "lang", "source")

  // ---------------------------------------------------------------- q216
  /** Daily cohort retention over the event stream
    * ([[operators.Retention.cohortRetention]]): users cohorted by
    * first-activity DAY (epoch-day integers — the synthetic feed spans
    * ~one month, so daily periods give a real curve where monthly
    * would collapse to one cell), survivors counted per
    * days-since-cohort, retention as exact integer ppm.
    */
  def q216CohortRetention(s: SparkSession, d: String): DataFrame =
    operators.Retention.cohortRetention(
        events(s, d).withColumn("period",
          expr("ts DIV 86400000000000")), // exact epoch-day from ns
        "user_id", "period")
      .orderBy(col("cohort"), col("k"))

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

  // ---------------------------------------------------------------- q218
  /** k-truss peel over the FULL co-purchase graph
    * ([[operators.KTruss.peelRounds]]) — the edge-strength sibling of
    * q148's k-core: surviving edges must each close ≥ k−2 triangles
    * inside the surviving subgraph. The full graph (not the
    * ≥2-support slice): every order's basket is a clique, so basket
    * edges carry support ≥ |basket|−2 and k = 7 selects the ≥7-item
    * co-purchase cores at every scale (the ≥2-support slice loses its
    * triangles as the part pool grows with SF; k = 5 would keep ~75%
    * of the graph and triple the peel cost for no extra semantics).
    * Fixed 2 rounds for oracle replay (unrolled CTEs, the
    * kcorePeelSql discipline) — round 1 pays the full-graph support
    * pass, the survivors are small. Seventh consumer of the shared
    * co-purchase edge artifact.
    */
  def q218KtrussPeel(s: SparkSession, d: String): DataFrame =
    operators.KTruss.peelRounds(
        copurchasePairs(s, d).select(col("pa"), col("pb")),
        "pa", "pb", k = 7, rounds = 2)
      .orderBy(col("lo"), col("hi"))

  // ---------------------------------------------------------------- q219
  /** FORWARD as-of join ([[operators.TemporalJoins.asofJoinForward]]):
    * every click gains the same user's EARLIEST view value at-or-after
    * it — the "next event" lookup, time-negated onto the native
    * backward sort-merge exec. Oracle: DuckDB's native forward ASOF
    * (`c.ts <= v.ts`).
    */
  def q219AsofForward(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoinForward(clicks,
        views.withColumnRenamed("v_user", "user_id"), Seq("user_id"),
        leftTs = "ts", rightTs = "v_ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q220
  /** IDF-weighted Jaccard near-dup pairs over the planted-dup corpus
    * ([[operators.TextDedup.weightedJaccardPairs]]): rare shared
    * content dominates, ubiquitous boilerplate shingles score ~0 —
    * the dedup refinement plain Jaccard lacks. Integer milli-weights
    * (one rounded ln per shingle type), exact BIGINT weight sums, one
    * rounded divide per pair.
    */
  def q220WeightedJaccard(s: SparkSession, d: String): DataFrame =
    operators.TextDedup.weightedJaccardPairs(
        dedupCorpus(s, d), "doc_id", "text", k = 3, threshold = 0.25)
      .orderBy(col("id1"), col("id2"))

  // ---------------------------------------------------------------- q221
  /** NEAREST as-of join ([[operators.TemporalJoins.asofJoinNearest]]):
    * every click gains the temporally CLOSEST same-user view value in
    * either direction (ties backward) — two native as-of passes in
    * one pipeline, no self-join. Oracle: both DuckDB ASOF directions
    * + the same closest-pick CASE.
    */
  def q221AsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoinNearest(clicks,
        views.withColumnRenamed("v_user", "user_id"), Seq("user_id"),
        leftTs = "ts", rightTs = "v_ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q222
  /** Cross-source duplication matrix: near-dup pairs from the shared
    * PPJoin artifact mapped to their base documents' sources (synthetic
    * +1M/+2M copies fold onto their originals), counted per unordered
    * source pair — WHICH corpora duplicate EACH OTHER, the governance
    * view q193's per-source rate cannot give. 17th pair-artifact
    * consumer; two broadcast-sized joins and one hash agg.
    */
  def q222SourceDupMatrix(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    dedupPairs(s, d)
      .select((col("id1") % 1000000L).as("b1"),
        (col("id2") % 1000000L).as("b2"))
      .join(src.select(col("doc_id").as("b1"), col("source").as("s1")),
        Seq("b1"))
      .join(src.select(col("doc_id").as("b2"), col("source").as("s2")),
        Seq("b2"))
      .groupBy(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---------------------------------------------------------------- q223
  /** Conditional entropy of event transitions H(next | current) —
    * how PREDICTABLE the next event type is given the current one
    * (0 = deterministic journeys, ln|types| = memoryless), the
    * one-number sequence-structure summary over q203's transition
    * frame. Per-pair term `c_ab · round(ln(c_ab / c_a·), 6)` summed
    * in DECIMAL (rounded-ln doctrine), H = −sum / T published 6 dp
    * alongside the exact pieces.
    */
  def q223TransitionEntropy(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .filter(col("t2").isNotNull)
      .groupBy(col("event_type").as("a"), col("t2").as("b"))
      .agg(count(lit(1)).as("c"))
    val fromTot = pairs.groupBy(col("a")).agg(sum(col("c")).as("ca"))
    val tot = pairs.agg(sum(col("c")).as("t"), count(lit(1)).as("n_pairs"))
    pairs.join(fromTot, Seq("a"))
      .crossJoin(broadcast(tot))
      .withColumn("__t", (col("c") * round(log(
        col("c").cast("double") / col("ca").cast("double")), 6)
        .cast("decimal(18,6)")).cast("decimal(28,6)"))
      .groupBy(col("t"), col("n_pairs"))
      .agg(sum(col("__t")).cast("decimal(28,6)").as("__s"))
      .select(col("t").as("n_transitions"), col("n_pairs"),
        col("__s").cast("double").as("sum_clogp"),
        // + 0.0: a fully deterministic corpus sums to 0 and -0.0 hashes
        // differently from 0.0 in the checker
        round(-col("__s").cast("double") / col("t").cast("double") + 0.0, 6)
          .as("cond_entropy"))
  }

  // ---------------------------------------------------------------- q224
  /** Per-label embedding-centroid cosine matrix
    * ([[operators.Similarity.labelCentroidCosines]]) — the drift
    * monitor between labeled sub-populations; the group size cancels,
    * so only exact DECIMAL component sums cross the wire and one
    * sqrt+divide per pair closes it.
    */
  def q224CentroidDrift(s: SparkSession, d: String): DataFrame =
    operators.Similarity.labelCentroidCosines(
        embeddings(s, d), "label", "embedding")
      .select(col("ga").as("label_a"), col("gb").as("label_b"),
        col("centroid_cosine"))
      .orderBy(col("label_a"), col("label_b"))

  // ------------------------------------------------------------------

  /** Shared per-session artifacts in dependency order (labels reads
    * pairs). Bench pre-materializes these before its timed query loop
    * and bills each as its own `artifact_*` entry, so the one-time
    * generation cost stops landing on whichever consumer query happens
    * to run first (q104 absorbed the whole PPJoin pass in round 7) and
    * per-query numbers stay attributable round over round. Forcing one
    * is just invoking the memoized builder — consumers then read
    * parquet.
    */
  def artifacts: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "artifact_pairs" -> ((s, d) => { dedupPairs(s, d); () }),
    "artifact_labels" -> ((s, d) => { dedupLabels(s, d); () }),
    "artifact_epairs" -> ((s, d) => { embedPairs(s, d); () }),
    "artifact_edges" -> ((s, d) => { copurchasePairs(s, d); () }))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_agg" -> (q01ScanAgg _),
    "q02_join_dims" -> (q02JoinDims _),
    "q03_insert_not_existing_anti" -> (q03AntiJoin _),
    "q04_existence_probe_semi" -> (q04SemiJoin _),
    "q05_drop_duplicates_first" -> (q05DropDuplicatesFirst _),
    "q06_join_duplicates" -> (q06JoinDuplicates _),
    "q07_detect_duplicates" -> (q07DetectDuplicates _),
    "q08_update_all_join" -> (q08UpdateAllJoin _),
    "q09_update_first" -> (q09UpdateFirst _),
    "q10_upsert_pipeline" -> (q10UpsertPipeline _),
    "q11_insert_pipeline" -> (q11InsertPipeline _),
    "q12_arrival_ordinal" -> (q12ArrivalOrdinal _),
    "q13_decimal_formats" -> (q13DecimalFormats _),
    "q14_case_email" -> (q14CaseEmail _),
    "q15_date_chain" -> (q15DateChain _),
    "q16_coercions" -> (q16Coercions _),
    "q17_base64_blob" -> (q17Base64Blob _),
    "q18_infer_types" -> (q18InferTypes _),
    "q19_text_stats" -> (q19TextStats _),
    "q20_lang_id" -> (q20LangId _),
    "q21_fingerprint" -> (q21Fingerprint _),
    "q22_exact_dedup" -> (q22ExactDedup _),
    "q23_minhash_lsh" -> (q23MinhashLsh _),
    "q24_ngram_jaccard" -> (q24NgramJaccard _),
    "q25_simhash" -> (q25Simhash _),
    "q26_ann_topk" -> (q26AnnTopK _),
    "q27_ann_ivf" -> (q27AnnIvf _),
    "q28_embedding_near_dup" -> (q28EmbeddingNearDup _),
    "q29_multimodal_meta" -> (q29MultimodalMeta _),
    "q30_src_csv" -> (q30SrcCsv _),
    "q31_src_json" -> (q31SrcJson _),
    "q32_src_xml" -> (q32SrcXml _),
    "q33_src_yaml" -> (q33SrcYaml _),
    "q34_src_vcf" -> (q34SrcVcf _),
    "q35_src_compressed" -> (q35SrcCompressed _),
    "q36_table_names" -> (q36TableNames _),
    "q37_event_windows" -> (q37EventWindows _),
    "q38_src_xlsx" -> (q38SrcXlsx _),
    "q39_src_ods" -> (q39SrcOds _),
    "q40_src_kdbx" -> (q40SrcKdbx _),
    "q41_salted_join" -> (q41SaltedJoin _),
    "q42_src_xls" -> (q42SrcXls _),
    "q43_session_windows" -> (q43SessionWindows _),
    "q44_asof_join" -> (q44AsofJoin _),
    "q45_range_join" -> (q45RangeJoin _),
    "q46_bloom_anti" -> (q46BloomAnti _),
    "q47_tfidf" -> (q47Tfidf _),
    "q48_quantiles" -> (q48Quantiles _),
    "q49_rollup" -> (q49Rollup _),
    "q50_setops" -> (q50SetOps _),
    "q51_group_topk" -> (q51GroupTopK _),
    "q52_window_analytics" -> (q52WindowAnalytics _),
    "q53_pivot" -> (q53Pivot _),
    "q54_histogram" -> (q54Histogram _),
    "q55_ntile" -> (q55Ntile _),
    "q56_normalize" -> (q56Normalize _),
    "q57_pii_mask" -> (q57PiiMask _),
    "q58_hash_split" -> (q58HashSplit _),
    "q59_chunking" -> (q59Chunking _),
    "q60_repetition_quality" -> (q60RepetitionQuality _),
    "q61_lev_neardup" -> (q61LevNearDup _),
    "q62_image_decode" -> (q62ImageDecode _),
    "q63_correlation" -> (q63Correlation _),
    "q64_vocab" -> (q64Vocab _),
    "q65_incremental_neardup" -> (q65IncrementalNearDup _),
    "q66_audio_decode" -> (q66AudioDecode _),
    "q67_dedup_clusters" -> (q67DedupClusters _),
    "q68_decontamination" -> (q68Decontamination _),
    "q69_sequence_packing" -> (q69SequencePacking _),
    "q70_stratified_sample" -> (q70StratifiedSample _),
    "q71_source_quota" -> (q71SourceQuota _),
    "q72_substring_spans" -> (q72SubstringSpans _),
    "q73_table_checksum" -> (q73TableChecksum _),
    "q74_cube" -> (q74Cube _),
    "q75_distribution_ranks" -> (q75DistributionRanks _),
    "q76_inverted_index" -> (q76InvertedIndex _),
    "q77_keyword_search" -> (q77KeywordSearch _),
    "q78_quantized_ann" -> (q78QuantizedAnn _),
    "q79_snapshot_diff" -> (q79SnapshotDiff _),
    "q80_funnel" -> (q80Funnel _),
    "q81_incremental_agg" -> (q81IncrementalAgg _),
    "q82_json_extract" -> (q82JsonExtract _),
    "q83_pagerank" -> (q83PageRank _),
    "q84_resample_ffill" -> (q84ResampleFfill _),
    "q85_profile" -> (q85Profile _),
    "q86_cdc_apply" -> (q86CdcApply _),
    "q87_zorder" -> (q87ZOrder _),
    "q88_debounce" -> (q88Debounce _),
    "q89_kmeans" -> (q89Kmeans _),
    "q90_source_mix" -> (q90SourceMix _),
    "q91_corpus_quality" -> (q91CorpusQuality _),
    "q92_curation_pipeline" -> (q92CurationPipeline _),
    "q93_line_boilerplate" -> (q93LineBoilerplate _),
    "q94_video_frames" -> (q94VideoFrames _),
    "q95_repetition" -> (q95Repetition _),
    "q96_pii_redact" -> (q96PiiRedact _),
    "q97_embedding_clusters" -> (q97EmbeddingClusters _),
    "q98_bpe_merges" -> (q98BpeMerges _),
    "q99_pca_covariance" -> (q99PcaCovariance _),
    "q100_ngram_lm" -> (q100NgramLm _),
    "q101_source_overlap" -> (q101SourceOverlap _),
    "q102_mutual_knn" -> (q102MutualKnn _),
    "q103_dsir" -> (q103Dsir _),
    "q104_canonical_dedup" -> (q104CanonicalDedup _),
    "q105_kmv_sketch" -> (q105KmvSketch _),
    "q106_token_entropy" -> (q106TokenEntropy _),
    "q107_pmi_collocations" -> (q107PmiCollocations _),
    "q108_lsh_recall" -> (q108LshRecall _),
    "q109_mad_outliers" -> (q109MadOutliers _),
    "q110_bpe_encode" -> (q110BpeEncode _),
    "q111_weighted_sample" -> (q111WeightedSample _),
    "q112_event_transitions" -> (q112EventTransitions _),
    "q113_dup_provenance" -> (q113DupProvenance _),
    "q114_decayed_engagement" -> (q114DecayedEngagement _),
    "q115_cohort_retention" -> (q115CohortRetention _),
    "q116_simhash_pairs" -> (q116SimhashPairs _),
    "q117_heavy_hitters" -> (q117HeavyHitters _),
    "q118_sessions" -> (q118Sessions _),
    "q119_triangles" -> (q119Triangles _),
    "q120_resample" -> (q120Resample _),
    "q121_bm25" -> (q121Bm25 _),
    "q123_scd2" -> (q123Scd2 _),
    "q126_leakage_split" -> (q126LeakageSplit _),
    "q127_rrf" -> (q127Rrf _),
    "q128_association_rules" -> (q128AssociationRules _),
    "q129_gini" -> (q129Gini _),
    "q130_ab_test" -> (q130AbTest _),
    "q131_survival" -> (q131Survival _),
    "q132_retrieval_eval" -> (q132RetrievalEval _),
    "q133_psi_drift" -> (q133PsiDrift _),
    "q134_communities" -> (q134Communities _),
    "q135_rolling_anomaly" -> (q135RollingAnomaly _),
    "q136_changepoint" -> (q136Changepoint _),
    "q137_purged_split" -> (q137PurgedSplit _),
    "q138_target_encode" -> (q138TargetEncode _),
    "q139_hard_negatives" -> (q139HardNegatives _),
    "q140_clustering_coeff" -> (q140ClusteringCoeff _),
    "q141_silence_spans" -> (q141SilenceSpans _),
    "q142_image_dhash" -> (q142ImageDhash _),
    "q143_fuzzy_blocking" -> (q143FuzzyBlocking _),
    "q144_bfs_reach" -> (q144BfsReach _),
    "q145_funnel" -> (q145Funnel _),
    "q146_twa" -> (q146Twa _),
    "q147_keyness" -> (q147Keyness _),
    "q148_kcore_peel" -> (q148KcorePeel _),
    "q149_scene_change" -> (q149SceneChange _),
    "q150_hll_sketch" -> (q150HllSketch _),
    "q151_woe_binning" -> (q151WoeBinning _),
    "q152_assortativity" -> (q152Assortativity _),
    "q153_mann_whitney" -> (q153MannWhitney _),
    "q154_dhash_hamming" -> (q154DhashHamming _),
    "q155_sorted_neighborhood" -> (q155SortedNeighborhood _),
    "q156_cms_sketch" -> (q156CmsSketch _),
    "q157_user_trend" -> (q157UserTrend _),
    "q158_trimmed_mean" -> (q158TrimmedMean _),
    "q159_benford" -> (q159Benford _),
    "q160_jaro_winkler" -> (q160JaroWinkler _),
    "q161_personalized_pr" -> (q161PersonalizedPr _),
    "q162_readability" -> (q162Readability _),
    "q163_ks_test" -> (q163KsTest _),
    "q164_chunking" -> (q164Chunking _),
    "q165_containment" -> (q165Containment _),
    "q166_hist_quantiles" -> (q166HistQuantiles _),
    "q167_dup_source_matrix" -> (q167DupSourceMatrix _),
    "q168_quantile_normalize" -> (q168QuantileNormalize _),
    "q169_attribution" -> (q169Attribution _),
    "q170_zipf_fit" -> (q170ZipfFit _),
    "q171_power_law" -> (q171PowerLaw _),
    "q172_jdbc_roundtrip" -> (q172JdbcRoundtrip _),
    "q173_adamic_adar" -> (q173AdamicAdar _),
    "q174_item_cosine" -> (q174ItemCosine _),
    "q175_hits" -> (q175Hits _),
    "q176_chi_square" -> (q176ChiSquare _),
    "q177_spearman" -> (q177Spearman _),
    "q178_ewma" -> (q178Ewma _),
    "q179_textrank" -> (q179TextRank _),
    "q180_kwic" -> (q180Kwic _),
    "q181_sssp" -> (q181Sssp _),
    "q182_kappa" -> (q182Kappa _),
    "q183_moments" -> (q183Moments _),
    "q184_diversity" -> (q184Diversity _),
    "q185_partition_balance" -> (q185PartitionBalance _),
    "q186_silhouette" -> (q186Silhouette _),
    "q187_jl_recall" -> (q187JlRecall _),
    "q188_constraint_audit" -> (q188ConstraintAudit _),
    "q189_triple_itemsets" -> (q189TripleItemsets _),
    "q190_conversion_delay" -> (q190ConversionDelay _),
    "q191_label_noise" -> (q191LabelNoise _),
    "q192_length_buckets" -> (q192LengthBuckets _),
    "q193_source_dup_rate" -> (q193SourceDupRate _),
    "q194_burstiness" -> (q194Burstiness _),
    "q195_cluster_histogram" -> (q195ClusterHistogram _),
    "q196_vector_hygiene" -> (q196VectorHygiene _),
    "q197_quality_dup_deciles" -> (q197QualityDupDeciles _),
    "q198_seasonality" -> (q198Seasonality _),
    "q199_oov_rate" -> (q199OovRate _),
    "q200_datacard" -> (q200Datacard _),
    "q201_forget_cascade" -> (q201ForgetCascade _),
    "q202_journey_trigrams" -> (q202JourneyTrigrams _),
    "q203_transition_dwell" -> (q203TransitionDwell _),
    "q204_asof_native" -> (q204AsofNative _),
    "q205_watermark_sizing" -> (q205WatermarkSizing _),
    "q206_survivor_audit" -> (q206SurvivorAudit _),
    "q207_stream_windows" -> (q207StreamWindows _),
    "q208_pii_mask" -> (q208PiiMask _),
    "q209_trigram_repetition" -> (q209TrigramRepetition _),
    "q210_stream_dedup" -> (q210StreamDedup _),
    "q211_stream_sessions" -> (q211StreamSessions _),
    "q212_stream_append" -> (q212StreamAppend _),
    "q213_stream_interval_join" -> (q213StreamIntervalJoin _),
    "q214_stream_upsert" -> (q214StreamUpsert _),
    "q215_mutual_info" -> (q215MutualInfo _),
    "q216_cohort_retention" -> (q216CohortRetention _),
    "q217_novelty" -> (q217Novelty _),
    "q218_ktruss_peel" -> (q218KtrussPeel _),
    "q219_asof_forward" -> (q219AsofForward _),
    "q220_weighted_jaccard" -> (q220WeightedJaccard _),
    "q221_asof_nearest" -> (q221AsofNearest _),
    "q222_source_dup_matrix" -> (q222SourceDupMatrix _),
    "q223_transition_entropy" -> (q223TransitionEntropy _),
    "q224_centroid_drift" -> (q224CentroidDrift _),
  )

  // --- shared DuckDB SQL fragments for the LLM-pipeline oracles -------

  /** Whitespace tokens of lowercased text (mirrors TextAnalysis.tokens). */
  private val SqlToks =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  /** The dedup corpus CTE body (mirrors dedupCorpus). */
  private val SqlCorpus =
    """corpus AS (
      | SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
      | UNION ALL SELECT doc_id + 2000000 AS doc_id,
      |  regexp_replace(text, '^(\S+\s+){3}', '') AS text FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** Distinct word-3-gram shingles per corpus doc (mirrors
    * TextShingles.shingles with k=3 + array_distinct).
    */
  private val SqlShingles3 =
    s"""tok AS (SELECT doc_id, $SqlToks AS toks FROM corpus),
       |shl AS (SELECT doc_id,
       | CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(generate_series(1, len(toks) - 2),
       |            i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END AS shingles
       | FROM tok),
       |s AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM shl)""".stripMargin

  /** 32-term SimHash sum (mirrors TextDedup.simhash32). */
  private val SqlSimhash: String = (0 until 32).map { j =>
    s"(CASE WHEN list_sum(list_transform(toks, t -> " +
      s"((CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) >> $j) & 1) * 2 - 1)) > 0 " +
      s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
  }.mkString(" + ")

  /** Double-precision cosine over DOUBLE[] lists (mirrors
    * Similarity.cosine's left-to-right summation).
    */
  private def sqlCosine(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Hyperplane-LSH candidate pairs + exact cosine over the q28/q97
    * corpus-with-planted-copies, as a CTE chain ending in `p(id1, id2,
    * sim)`. The SAME hyperplane literals as
    * `Similarity.nearDupPairsLsh` — the LSH banding is part of the
    * operator's portable definition.
    */
  /** Hyperplane bit + band-key SQL column lists for a (planes, bands)
    * LSH config — the SAME `hyperplaneWeights` literals as the Spark
    * tiers, so the banding is part of the operator's portable
    * definition. Returns (bitCols, bandCols) for `bit0..bitN` /
    * `b0..bB` projections.
    */
  private def sqlBandCols(numPlanes: Int, bands: Int): (String, String) = {
    val w = operators.Similarity.hyperplaneWeights(numPlanes, 64)
    val r = numPlanes / bands
    val bitCols = w.indices.map { i =>
      // Double.toString round-trips exactly; DuckDB parses E-notation
      val arr = w(i).mkString(", ")
      s"CASE WHEN list_dot_product(v, [$arr]) > 0 THEN 1 ELSE 0 END AS bit$i"
    }.mkString(",\n ")
    val bandCols = (0 until bands).map { b =>
      (0 until r).map(i => s"bit${b * r + i}*${1 << (r - 1 - i)}").mkString(" + ") +
        s" AS b$b"
    }.mkString(", ")
    (bitCols, bandCols)
  }

  private lazy val SqlLshPairs: String = {
    val bands = 4
    val (bitCols, bandCols) = sqlBandCols(24, bands)
    s"""c AS (
       | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       | UNION ALL SELECT vec_id + 1000000 AS vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id % 10 = 0),
       |bits AS (SELECT vec_id, label, v,
       | $bitCols
       | FROM c),
       |band AS (SELECT vec_id, label, v, $bandCols FROM bits),
       |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       | FROM band a JOIN band b ON a.label = b.label AND a.vec_id < b.vec_id
       |  AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
       |p AS (SELECT cand.id1, cand.id2, ${sqlCosine("x.v", "y.v")} AS sim
       | FROM cand JOIN c x ON x.vec_id = cand.id1 JOIN c y ON y.vec_id = cand.id2)""".stripMargin
  }

  /** DuckDB-equivalent SQL per query (same tables, same aliases, same
    * ORDER BY).
    */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_dims" ->
      """SELECT n_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q03_insert_not_existing_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q04_existence_probe_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q05_drop_duplicates_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q06_join_duplicates" ->
      """WITH src AS (
        | SELECT user_id, event_id,
        |  CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v, props
        | FROM events)
        |SELECT user_id, last_v_incl_null, last_v_non_null, last_props FROM (
        | SELECT user_id,
        |  last_value(v) OVER w AS last_v_incl_null,
        |  last_value(v IGNORE NULLS) OVER w AS last_v_non_null,
        |  last_value(props IGNORE NULLS) OVER w AS last_props,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM src
        | WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q07_detect_duplicates" ->
      """SELECT count(*) AS dup_keys,
        | CAST(coalesce(sum(dup_count), 0) AS BIGINT) AS dup_rows
        |FROM (SELECT l_orderkey, count(*) AS dup_count FROM lineitem
        |      GROUP BY l_orderkey HAVING count(*) > 1)""".stripMargin,
    "q08_update_all_join" ->
      """WITH staged AS (
        | SELECT o_custkey AS c_custkey,
        |  CASE WHEN max(o_totalprice) < 150000.0 THEN NULL
        |       ELSE max(o_totalprice) END AS new_acctbal
        | FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey, c.c_name,
        | CASE WHEN s.c_custkey IS NOT NULL
        |      THEN coalesce(s.new_acctbal, c.c_acctbal) ELSE c.c_acctbal END AS c_acctbal,
        | c.c_mktsegment
        |FROM customer c LEFT JOIN staged s ON c.c_custkey = s.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q09_update_first" ->
      """WITH staged AS (
        | SELECT o_orderkey AS l_orderkey, max(o_totalprice) AS new_qty
        | FROM orders GROUP BY o_orderkey),
        |t AS (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
        | FROM lineitem)
        |SELECT t.l_orderkey, t.l_linenumber, t.l_partkey, t.l_suppkey, t.l_extendedprice,
        | CASE WHEN t.rn = 1 AND s.l_orderkey IS NOT NULL THEN s.new_qty
        |      ELSE t.l_quantity END AS l_quantity
        |FROM t LEFT JOIN staged s ON t.l_orderkey = s.l_orderkey
        |ORDER BY t.l_orderkey, t.l_linenumber, t.l_partkey, t.l_suppkey, t.l_extendedprice""".stripMargin,
    "q10_upsert_pipeline" ->
      """WITH src AS (
        | SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 2000000
        |             ELSE o_custkey END AS c_custkey,
        |  CASE WHEN o_orderstatus = 'F' THEN NULL
        |       ELSE 'cust_' || o_orderpriority END AS c_name,
        |  o_totalprice AS c_acctbal, o_orderkey AS ord
        | FROM orders),
        |staged AS (
        | SELECT c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_custkey,
        |   last_value(c_name IGNORE NULLS) OVER w AS c_name,
        |   last_value(c_acctbal IGNORE NULLS) OVER w AS c_acctbal,
        |   row_number() OVER (PARTITION BY c_custkey ORDER BY ord) AS rn
        |  FROM src
        |  WINDOW w AS (PARTITION BY c_custkey ORDER BY ord
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        | WHERE rn = 1),
        |updated AS (
        | SELECT c.c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN coalesce(s.c_name, c.c_name)
        |       ELSE c.c_name END AS c_name,
        |  c.c_nationkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN coalesce(s.c_acctbal, c.c_acctbal)
        |       ELSE c.c_acctbal END AS c_acctbal,
        |  c.c_mktsegment
        | FROM customer c LEFT JOIN staged s ON c.c_custkey = s.c_custkey),
        |inserted AS (
        | SELECT s.c_custkey, s.c_name, CAST(NULL AS INTEGER) AS c_nationkey,
        |  s.c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        | FROM staged s
        | WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey))
        |SELECT * FROM updated UNION ALL SELECT * FROM inserted ORDER BY c_custkey""".stripMargin,
    "q11_insert_pipeline" ->
      """WITH src AS (
        | SELECT o_custkey % 7000 AS c_custkey, 'new_' || o_orderstatus AS c_name,
        |  o_totalprice AS c_acctbal, o_orderkey AS ord
        | FROM orders),
        |staged AS (
        | SELECT c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_custkey, c_name, c_acctbal,
        |   row_number() OVER (PARTITION BY c_custkey ORDER BY ord) AS rn
        |  FROM src) WHERE rn = 1),
        |survivors AS (
        | SELECT s.c_custkey, s.c_name, s.c_acctbal FROM staged s
        | WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey))
        |SELECT c_custkey, c_name, c_acctbal FROM customer
        |UNION ALL SELECT c_custkey, c_name, c_acctbal FROM survivors
        |ORDER BY c_custkey, c_name""".stripMargin,
    "q12_arrival_ordinal" ->
      """SELECT o_orderkey, o_custkey,
        | row_number() OVER (ORDER BY o_orderkey) AS import_item
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // q13: the oracle asserts exact numeric round-trip of the formatted
    // strings (p_retailprice is 2dp in the test data).
    "q13_decimal_formats" ->
      """SELECT p_partkey, p_retailprice AS parsed_dot, p_retailprice AS parsed_comma
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q14_case_email" ->
      """WITH src AS (
        | SELECT c_custkey, c_mktsegment, c_name,
        |  'User.' || c_custkey ||
        |   CASE WHEN c_custkey % 5 = 0 THEN '.Example.COM  '
        |        ELSE '@Example.COM  ' END AS raw
        | FROM customer)
        |SELECT c_custkey, lower(trim(raw)) AS email_clean,
        | regexp_matches(lower(trim(raw)),
        |  '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') AS email_valid,
        | lower(c_mktsegment) AS seg_lc, upper(c_name) AS name_uc
        |FROM src ORDER BY c_custkey""".stripMargin,
    // q15: round-trip identity + fixed-offset shift (+02:00 → UTC = -2h).
    "q15_date_chain" ->
      """SELECT o_orderkey, o_orderdate AS parsed_ts,
        | o_orderdate - INTERVAL 2 HOUR AS shifted_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q16_coercions" ->
      """WITH src AS (
        | SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'true' WHEN c_custkey % 4 = 1 THEN 'False'
        |       WHEN c_custkey % 4 = 2 THEN '1' ELSE 'no' END AS bool_str,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'true'
        |       WHEN c_custkey % 3 = 1 THEN c_custkey || '.0'
        |       ELSE CAST(c_custkey AS VARCHAR) END AS int_str,
        |  CASE WHEN c_custkey % 7 = 0 THEN 'NULL' ELSE c_mktsegment END AS token_str
        | FROM customer)
        |SELECT c_custkey,
        | CASE WHEN lower(trim(bool_str)) IN ('true','1','yes','y','j') THEN true
        |      WHEN lower(trim(bool_str)) IN ('false','0','no','n') THEN false
        |      END AS bool_val,
        | CASE WHEN lower(trim(int_str)) = 'true' THEN 1
        |      WHEN lower(trim(int_str)) = 'false' THEN 0
        |      WHEN contains(lower(trim(int_str)), '.')
        |       THEN CAST(CAST(lower(trim(int_str)) AS DOUBLE) AS INTEGER)
        |      ELSE CAST(lower(trim(int_str)) AS INTEGER) END AS int_val,
        | CASE WHEN token_str = 'NULL' THEN NULL ELSE token_str END AS segment_or_null,
        | coalesce(CASE WHEN token_str = 'NULL' THEN NULL ELSE token_str END, '')
        |  AS segment_repaired
        |FROM src ORDER BY c_custkey""".stripMargin,
    "q17_base64_blob" ->
      """SELECT doc_id, hex(encode(substr(text, 1, 64))) AS blob_out
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q18_infer_types" ->
      """WITH src AS (
        | SELECT CAST(o_orderkey AS VARCHAR) AS c1, CAST(o_totalprice AS VARCHAR) AS c2,
        |  strftime(o_orderdate, '%d.%m.%Y') AS c3,
        |  CASE WHEN o_orderstatus = 'F' THEN 'true' ELSE 'false' END AS c4,
        |  o_orderpriority AS c5,
        |  CAST(o_orderkey * 1000000000 AS VARCHAR) AS c6,
        |  strftime(o_orderdate, '%d.%m.%Y %H:%M:%S') AS c7
        | FROM orders),
        |lng AS (SELECT column_name, trim(v) AS v FROM src
        |        UNPIVOT (v FOR column_name IN (c1, c2, c3, c4, c5, c6, c7))),
        |st AS (SELECT column_name,
        |  bool_and(regexp_matches(v, '(^\d{2}\.\d{2}\.\d{4}$)|(^\d{4}-\d{2}-\d{2}$)')) AS all_date,
        |  bool_and(regexp_matches(v, '(^\d{2}\.\d{2}\.\d{4} \d{2}:\d{2}:\d{2}$)|(^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}$)')) AS all_datetime,
        |  bool_and(regexp_matches(v, '^[+-]?\d{1,9}$')) AS all_int,
        |  bool_and(regexp_matches(v, '^[+-]?\d{1,18}$')) AS all_bigint,
        |  bool_and(regexp_matches(v, '^[+-]?(\d+([.]\d*)?|[.]\d+)([eE][+-]?\d+)?$'))
        |   AND max(length(v)) <= 20 AS all_double,
        |  bool_and(regexp_matches(v, '^(true|false)$')) AS all_bool,
        |  max(strlen(v)) AS maxbytes
        | FROM lng GROUP BY column_name),
        |sel AS (SELECT column_name,
        |  CASE WHEN all_date THEN 'DATE' WHEN all_datetime THEN 'TIMESTAMP'
        |       WHEN all_int THEN 'INTEGER' WHEN all_bigint THEN 'BIGINT'
        |       WHEN all_double THEN 'DOUBLE' WHEN all_bool THEN 'BOOLEAN'
        |       WHEN maxbytes > 4000 THEN 'BLOB' ELSE 'VARCHAR' END AS data_type,
        |  maxbytes FROM st)
        |SELECT column_name, data_type,
        | CAST(CASE WHEN data_type = 'VARCHAR' THEN maxbytes ELSE 0 END AS BIGINT) AS data_size
        |FROM sel ORDER BY column_name""".stripMargin,
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
    "q22_exact_dedup" ->
      s"""WITH $SqlCorpus
         |SELECT min(doc_id) AS keep_id, count(*) AS group_size,
         | md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |FROM corpus GROUP BY fp ORDER BY keep_id""".stripMargin,
    "q23_minhash_lsh" -> {
      // universal-hash family over ONE md5 per shingle — mirrors
      // TextDedup.minhashBase / minhashSignature exactly
      val p = operators.TextDedup.MinhashPrime
      val sigCols = (0 until 12).map { j =>
        val (a, b) = operators.TextDedup.minhashParams(j)
        s"min(($a * hh + $b) % $p) AS s$j"
      }.mkString(",\n ")
      def bandExpr(cols: Seq[Int]): String =
        "md5(" + cols.map(j => s"CAST(s$j AS VARCHAR)").mkString(" || '|' || ") + ")"
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |hh0 AS (SELECT doc_id,
         |  CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % $p AS hh FROM s),
         |sig AS (SELECT doc_id, $sigCols FROM hh0 GROUP BY doc_id),
         |band AS (SELECT doc_id,
         | ${bandExpr(Seq(0, 1, 2))} AS b0,
         | ${bandExpr(Seq(3, 4, 5))} AS b1,
         | ${bandExpr(Seq(6, 7, 8))} AS b2,
         | ${bandExpr(Seq(9, 10, 11))} AS b3 FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         | FROM band a JOIN band b ON a.doc_id < b.doc_id
         |  AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |jac AS (SELECT c.id1, c.id2,
         |  CAST(com.common AS DOUBLE) / CAST(n1.n + n2.n - com.common AS DOUBLE) AS jaccard
         | FROM cand c JOIN com ON com.id1 = c.id1 AND com.id2 = c.id2
         | JOIN n n1 ON n1.doc_id = c.id1 JOIN n n2 ON n2.doc_id = c.id2)
         |SELECT id1, id2, round(jaccard, 6) AS jaccard FROM jac
         |WHERE jaccard >= 0.5 ORDER BY id1, id2""".stripMargin
    },
    "q24_ngram_jaccard" ->
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |jac AS (SELECT com.id1, com.id2,
         |  CAST(com.common AS DOUBLE) / CAST(n1.n + n2.n - com.common AS DOUBLE) AS jaccard
         | FROM com JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2)
         |SELECT id1, id2, round(jaccard, 6) AS jaccard FROM jac
         |WHERE jaccard >= 0.6 ORDER BY id1, id2""".stripMargin,
    "q25_simhash" ->
      s"""WITH $SqlCorpus,
         |tok AS (SELECT doc_id, $SqlToks AS toks FROM corpus)
         |SELECT doc_id, CAST($SqlSimhash AS BIGINT) AS simhash
         |FROM tok ORDER BY doc_id""".stripMargin,
    "q26_ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id >= 10),
         |scored AS (SELECT query_id, vec_id, ${sqlCosine("qv", "cv")} AS sim FROM q, c),
         |r AS (SELECT query_id, vec_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         | FROM scored)
         |SELECT query_id, rank, vec_id AS neighbor_id, round(sim, 6) AS sim
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q27_ann_ivf" ->
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
         |r AS (SELECT query_id, vec_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         | FROM scored)
         |SELECT query_id, rank, vec_id AS neighbor_id, round(sim, 6) AS sim
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q28_embedding_near_dup" ->
      s"""WITH $SqlLshPairs
         |SELECT id1, id2, round(sim, 6) AS sim FROM p
         |WHERE sim >= 0.99 ORDER BY id1, id2""".stripMargin,
    "q29_multimodal_meta" ->
      """WITH media AS (SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        | encode(text) AS payload FROM documents)
        |SELECT doc_id, media_type, octet_length(payload) AS byte_len,
        | upper(substr(hex(payload), 1, 16)) AS header_hex,
        | md5(upper(hex(payload))) AS content_md5
        |FROM media ORDER BY doc_id""".stripMargin,
    "q30_src_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q31_src_json" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,
    "q32_src_xml" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q33_src_yaml" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q34_src_vcf" ->
      """SELECT 'First' || c_custkey AS firstname, 'Cust' || c_custkey AS lastname,
        | 'First' || c_custkey || ' Cust' || c_custkey AS formatted_name,
        | '+490000' || c_custkey AS phone_1, 'CELL' AS phone_1_attr
        |FROM customer WHERE c_custkey % 97 = 0 ORDER BY lastname""".stripMargin,
    "q35_src_compressed" ->
      """SELECT v.variant, n.n_nationkey, n.n_name, n.n_regionkey
        |FROM nation n CROSS JOIN
        | (VALUES ('aeszip'), ('gz'), ('pwzip'), ('tgz'), ('zip')) v(variant)
        |ORDER BY v.variant, n.n_nationkey""".stripMargin,
    "q36_table_names" ->
      "SELECT n_nationkey, lower(n_name) AS table_name FROM nation ORDER BY n_nationkey",
    "q37_event_windows" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q38_src_xlsx" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q39_src_ods" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q40_src_kdbx" ->
      """SELECT 'cust' || c_custkey AS title, c_name AS username,
        | c_mktsegment AS notes
        |FROM customer WHERE c_custkey % 101 = 0 ORDER BY title""".stripMargin,
    "q41_salted_join" ->
      """WITH fact AS (SELECT
        |  CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 997 END AS skew_key,
        |  l_quantity FROM lineitem),
        |dim AS (SELECT DISTINCT o_orderkey % 997 AS skew_key FROM orders),
        |dim2 AS (SELECT skew_key, skew_key % 5 AS bucket_mod FROM dim)
        |SELECT bucket_mod, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM fact JOIN dim2 USING (skew_key)
        |GROUP BY bucket_mod ORDER BY bucket_mod""".stripMargin,
    "q42_src_xls" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q43_session_windows" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
        |m AS (SELECT user_id, t, value,
        |  CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |       OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        | FROM e),
        |g AS (SELECT user_id, t, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS grp
        | FROM m)
        |SELECT min(t) AS session_start, user_id, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, grp ORDER BY user_id, session_start""".stripMargin,
    "q44_asof_join" ->
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "q45_range_join" ->
      """WITH clicks AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts AS view_ts FROM events
        |  WHERE event_type = 'view')
        |SELECT c.user_id, c.event_id, count(*) AS n_views_nearby
        |FROM clicks c JOIN views v ON c.user_id = v.user_id
        | AND v.view_ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts + INTERVAL 5 MINUTE
        |GROUP BY c.user_id, c.event_id ORDER BY c.event_id""".stripMargin,
    "q46_bloom_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= '1998-01-01')
        |ORDER BY c_custkey""".stripMargin,
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
    "q48_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q49_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q50_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'),
        |b AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01')
        |SELECT 'both_years' AS op, c_custkey FROM (SELECT c_custkey FROM a
        |  INTERSECT SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'only_1995' AS op, c_custkey FROM (SELECT c_custkey FROM a
        |  EXCEPT SELECT c_custkey FROM b)
        |ORDER BY op, c_custkey""".stripMargin,
    "q51_group_topk" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rank
        | FROM orders)
        |WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q52_window_analytics" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts_utc,
        |  value FROM events)
        |SELECT user_id, event_id, ts_utc, value,
        | lag(value, 1) OVER w AS prev_value,
        | CAST(sum(CAST(value AS DECIMAL(18,6)))
        |   OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS DOUBLE) AS running_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,6)))
        |   OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |   AS DOUBLE) AS moving3_sum
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_utc, event_id)
        |ORDER BY user_id, ts_utc, event_id""".stripMargin,
    "q53_pivot" ->
      """SELECT n_name,
        | CAST(sum(CASE WHEN o_orderstatus = 'F'
        |   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        | CAST(sum(CASE WHEN o_orderstatus = 'O'
        |   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        | CAST(sum(CASE WHEN o_orderstatus = 'P'
        |   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q54_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q55_ntile" ->
      """WITH t AS (SELECT c_acctbal,
        |  ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        | FROM customer)
        |SELECT decile, count(*) AS n, min(c_acctbal) AS min_bal,
        | max(c_acctbal) AS max_bal,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |   AS avg_bal
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,
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
    "q61_lev_neardup" ->
      s"""WITH $SqlCorpus,
         |tok AS (SELECT doc_id, text, $SqlToks AS toks FROM corpus),
         |k AS (SELECT doc_id, text, array_to_string(
         |  CASE WHEN len(toks) >= 5 THEN list_slice(toks, len(toks) - 4, len(toks))
         |       ELSE toks END, ' ') AS suffix_key FROM tok)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         | CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
         |FROM k a JOIN k b ON a.suffix_key = b.suffix_key AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.text, b.text) <= 40
         |ORDER BY id1, id2""".stripMargin,
    "q62_image_decode" ->
      """SELECT p_partkey AS media_id,
        | CAST(8 + p_partkey % 24 AS BIGINT) AS width,
        | CAST(8 + p_partkey % 17 AS BIGINT) AS height,
        | CAST(p_partkey % 256 AS DOUBLE) AS mean_r,
        | CAST(p_partkey * 7 % 256 AS DOUBLE) AS mean_g,
        | CAST(p_partkey * 13 % 256 AS DOUBLE) AS mean_b
        |FROM part WHERE p_partkey % 7 = 0 ORDER BY media_id""".stripMargin,
    "q63_correlation" ->
      """WITH j AS (SELECT c_mktsegment,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS x,
        |  CAST(c_acctbal AS DECIMAL(18,2)) AS y
        | FROM orders JOIN customer ON o_custkey = c_custkey),
        |m AS (SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |  CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy,
        |  CAST(sum(x * y) AS DOUBLE) AS sxy
        | FROM j GROUP BY c_mktsegment)
        |SELECT c_mktsegment, n,
        | round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |   (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |    sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_price_bal,
        | sx / CAST(n AS DOUBLE) AS avg_price
        |FROM m ORDER BY c_mktsegment""".stripMargin,
    "q64_vocab" ->
      s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS token FROM documents)
         |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM tok GROUP BY token ORDER BY tf DESC, token LIMIT 20""".stripMargin,
    "q65_incremental_neardup" -> {
      val p = operators.TextDedup.MinhashPrime
      val sigCols = (0 until 12).map { j =>
        val (a, b) = operators.TextDedup.minhashParams(j)
        s"min(($a * hh + $b) % $p) AS s$j"
      }.mkString(",\n ")
      def bandExpr(cols: Seq[Int]): String =
        "md5(" + cols.map(j => s"CAST(s$j AS VARCHAR)").mkString(" || '|' || ") + ")"
      def side(name: String, src: String): String =
        s"""tok_$name AS (SELECT doc_id, $SqlToks AS toks FROM $src),
           |shl_$name AS (SELECT doc_id,
           | CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
           |      ELSE list_transform(generate_series(1, len(toks) - 2),
           |            i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END AS shingles
           | FROM tok_$name),
           |s_$name AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM shl_$name),
           |hh_$name AS (SELECT doc_id,
           |  CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % $p AS hh FROM s_$name),
           |sig_$name AS (SELECT doc_id, $sigCols FROM hh_$name GROUP BY doc_id),
           |band_$name AS (SELECT doc_id,
           | ${bandExpr(Seq(0, 1, 2))} AS b0,
           | ${bandExpr(Seq(3, 4, 5))} AS b1,
           | ${bandExpr(Seq(6, 7, 8))} AS b2,
           | ${bandExpr(Seq(9, 10, 11))} AS b3 FROM sig_$name),
           |n_$name AS (SELECT doc_id, count(*) AS n FROM s_$name GROUP BY doc_id)""".stripMargin
      s"""WITH idx AS (SELECT doc_id, text FROM documents),
         |prb AS (SELECT doc_id + 2000000 AS doc_id,
         |  regexp_replace(text, '^(\\S+\\s+){3}', '') AS text
         | FROM documents WHERE doc_id % 7 = 0),
         |${side("i", "idx")},
         |${side("q", "prb")},
         |cand AS (SELECT DISTINCT q.doc_id AS new_id, i.doc_id AS corpus_id
         | FROM band_q q JOIN band_i i
         |  ON q.b0 = i.b0 OR q.b1 = i.b1 OR q.b2 = i.b2 OR q.b3 = i.b3),
         |com AS (SELECT q.doc_id AS new_id, i.doc_id AS corpus_id, count(*) AS common
         | FROM s_q q JOIN s_i i ON q.sh = i.sh GROUP BY 1, 2),
         |jac AS (SELECT c.new_id, c.corpus_id,
         |  CAST(com.common AS DOUBLE) /
         |    CAST(nq.n + ni.n - com.common AS DOUBLE) AS jaccard
         | FROM cand c
         | JOIN com ON com.new_id = c.new_id AND com.corpus_id = c.corpus_id
         | JOIN n_q nq ON nq.doc_id = c.new_id
         | JOIN n_i ni ON ni.doc_id = c.corpus_id)
         |SELECT new_id, corpus_id, round(jaccard, 6) AS jaccard FROM jac
         |WHERE jaccard >= 0.5 ORDER BY new_id, corpus_id""".stripMargin
    },
    "q66_audio_decode" ->
      """SELECT s_suppkey AS media_id,
        | CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(1 AS BIGINT) AS channels,
        | CAST(4000 + s_suppkey % 50 * 100 AS BIGINT) AS n_samples,
        | CAST(1000 + s_suppkey * 31 % 20000 AS DOUBLE) AS rms
        |FROM supplier WHERE s_suppkey % 3 = 0 ORDER BY media_id""".stripMargin,
    "q67_dedup_clusters" ->
      s"""WITH RECURSIVE $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |edge AS (SELECT id1 AS a, id2 AS b FROM pair
         | UNION SELECT id2 AS a, id1 AS b FROM pair),
         |reach(src, dst) AS (
         | SELECT a, a FROM edge
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN edge e ON e.a = r.dst),
         |lab AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)
         |SELECT doc_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin,
    "q68_decontamination" ->
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
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
         |n AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY 1)
         |SELECT n.doc_id, n.n_shingles, coalesce(m.n_matched, 0) AS n_matched,
         | round(CAST(coalesce(m.n_matched, 0) AS DOUBLE)
         |   / CAST(n.n_shingles AS DOUBLE), 6) AS contam_frac,
         | CAST(CAST(coalesce(m.n_matched, 0) AS DOUBLE)
         |   / CAST(n.n_shingles AS DOUBLE) >= 0.5 AS BIGINT) AS is_contaminated
         |FROM n LEFT JOIN m ON m.doc_id = n.doc_id ORDER BY n.doc_id""".stripMargin,
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
    "q70_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
        |      < CASE WHEN lang = 'en' THEN 300 ELSE 900 END
        |ORDER BY doc_id""".stripMargin,
    "q71_source_quota" ->
      """WITH r AS (SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS quota_rank
        | FROM documents)
        |SELECT doc_id, source, quota_rank FROM r WHERE quota_rank <= 8
        |ORDER BY doc_id""".stripMargin,
    "q72_substring_spans" ->
      s"""WITH $SqlCorpus,
         |t AS (SELECT doc_id, $SqlToks AS toks FROM corpus),
         |tn AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |gp AS (SELECT doc_id, toks,
         |  unnest(generate_series(CAST(1 AS BIGINT), n - 14)) AS pos
         | FROM tn WHERE n >= 15),
         |g AS (SELECT doc_id, pos,
         |  md5(array_to_string(list_slice(toks, pos, pos + 14), ' ')) AS h FROM gp),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
         |ds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
         |c AS (SELECT doc_id, pos,
         |  CASE WHEN lag(pos) OVER w IS NULL THEN 15
         |       ELSE least(15, pos - lag(pos) OVER w) END AS contrib
         | FROM ds WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |agg AS (SELECT doc_id, count(*) AS n_dup_grams,
         |  sum(contrib) AS covered FROM c GROUP BY doc_id)
         |SELECT tn.doc_id, CAST(tn.n AS BIGINT) AS n_tokens,
         | CAST(coalesce(agg.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
         | CAST(coalesce(agg.covered, 0) AS BIGINT) AS covered_tokens,
         | CASE WHEN tn.n > 0 THEN
         |   round(CAST(coalesce(agg.covered, 0) AS DOUBLE) / CAST(tn.n AS DOUBLE), 6)
         |  ELSE 0.0 END AS dup_frac
         |FROM tn LEFT JOIN agg ON agg.doc_id = tn.doc_id
         |ORDER BY tn.doc_id""".stripMargin,
    "q73_table_checksum" -> {
      // mirrors TableChecksum.rowHash canonicalization: <charlen>:<value>
      def canon(e: String): String =
        s"(CAST(length(CAST($e AS VARCHAR)) AS VARCHAR) || ':' || CAST($e AS VARCHAR))"
      s"""WITH h AS (SELECT l_returnflag,
        |  CAST(('0x' || substr(md5(
        |    ${canon("l_orderkey")} || '|' || ${canon("l_partkey")} || '|' ||
        |    ${canon("l_suppkey")} || '|' || ${canon("l_linenumber")} || '|' ||
        |    ${canon("l_returnflag")} || '|' || ${canon("l_linestatus")}), 1, 12)) AS BIGINT) AS h
        | FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_rows, bit_xor(h) AS xor_checksum,
        | CAST(sum(CAST(h AS DECIMAL(38,0))) % 1000000007 AS BIGINT) AS sum_checksum
        |FROM h GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "q74_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
        | coalesce(n_name, 'ALL') AS nation,
        | count(*) AS n_cust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)
        |ORDER BY mktsegment, nation""".stripMargin,
    "q75_distribution_ranks" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
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
    "q78_quantized_ann" ->
      """WITH ex AS (SELECT vec_id,
        |  generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
        |  unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
        |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim),
        |qe AS (SELECT vec_id, ex.dim,
        |  CASE WHEN mx = mn THEN 0 ELSE floor((x - mn) / (mx - mn) * 255) END AS q
        | FROM ex JOIN st ON st.dim = ex.dim),
        |qq AS (SELECT vec_id, dim, q FROM qe WHERE vec_id < 10),
        |cc AS (SELECT vec_id, dim, q FROM qe WHERE vec_id >= 10),
        |dot AS (SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
        |  CAST(sum(CAST(qq.q AS BIGINT) * CAST(cc.q AS BIGINT)) AS BIGINT) AS qdot
        | FROM qq JOIN cc ON qq.dim = cc.dim GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, qdot,
        |  row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) AS rank
        | FROM dot)
        |SELECT query_id, rank, neighbor_id, qdot FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q79_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey AS k, o_custkey AS c,
        |  o_orderstatus AS s, o_orderpriority AS p FROM orders),
        |neu AS (
        | SELECT o_orderkey AS k, o_custkey AS c,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS s,
        |  o_orderpriority AS p
        | FROM orders WHERE o_orderkey % 13 <> 0
        | UNION ALL
        | SELECT o_orderkey + 1000000000 AS k, o_custkey AS c,
        |  o_orderstatus AS s, o_orderpriority AS p
        | FROM orders WHERE o_orderkey % 11 = 0)
        |SELECT coalesce(o.k, n.k) AS o_orderkey,
        | CASE WHEN o.k IS NULL THEN 'added'
        |      WHEN n.k IS NULL THEN 'removed'
        |      WHEN o.c <> n.c OR o.s <> n.s OR o.p <> n.p THEN 'changed'
        | END AS change_type
        |FROM old o FULL JOIN neu n ON o.k = n.k
        |WHERE (o.k IS NULL OR n.k IS NULL
        |       OR o.c <> n.c OR o.s <> n.s OR o.p <> n.p)
        |ORDER BY o_orderkey""".stripMargin,
    "q80_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |s AS (SELECT user_id, min(us) AS first_signup_us FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (SELECT ev.user_id, count(*) AS n_purch_7d
        |  FROM ev JOIN s ON s.user_id = ev.user_id
        |  WHERE ev.event_type = 'purchase' AND ev.us > s.first_signup_us
        |    AND ev.us <= s.first_signup_us + 604800000000
        |  GROUP BY ev.user_id)
        |SELECT s.user_id, s.first_signup_us,
        | coalesce(p.n_purch_7d, 0) AS n_purch_7d,
        | CAST(coalesce(p.n_purch_7d, 0) > 0 AS BIGINT) AS converted
        |FROM s LEFT JOIN p ON p.user_id = s.user_id
        |ORDER BY s.user_id""".stripMargin,
    "q81_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q82_json_extract" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        | CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q83_pagerank" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, sum(r0.pr / od.outdeg) AS s
        |  FROM e JOIN r0 ON r0.node = e.src JOIN od ON od.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.node,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |   + CAST(0.85 AS DOUBLE) * coalesce(c1.s, CAST(0 AS DOUBLE)) AS pr
        | FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, sum(r1.pr / od.outdeg) AS s
        |  FROM e JOIN r1 ON r1.node = e.src JOIN od ON od.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.node,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |   + CAST(0.85 AS DOUBLE) * coalesce(c2.s, CAST(0 AS DOUBLE)) AS pr
        | FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, sum(r2.pr / od.outdeg) AS s
        |  FROM e JOIN r2 ON r2.node = e.src JOIN od ON od.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.node,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |   + CAST(0.85 AS DOUBLE) * coalesce(c3.s, CAST(0 AS DOUBLE)) AS pr
        | FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT node AS part, round(pr, 6) AS pr FROM r3
        |ORDER BY round(pr, 6) DESC, node LIMIT 20""".stripMargin,
    "q84_resample_ffill" ->
      """WITH ev AS (SELECT user_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, value
        | FROM events WHERE user_id < 8),
        |h AS (SELECT user_id, us - (us % 3600000000) AS hour_us,
        |  count(*) AS n_events,
        |  sum(CAST(value AS DECIMAL(18,2))) AS sum_value
        | FROM ev GROUP BY 1, 2),
        |g AS (SELECT user_id,
        |  unnest(generate_series(min(hour_us), max(hour_us), 3600000000)) AS hour_us
        | FROM h GROUP BY user_id)
        |SELECT g.user_id, g.hour_us,
        | coalesce(h.n_events, 0) AS n_events,
        | CAST(last_value(h.sum_value IGNORE NULLS) OVER
        |   (PARTITION BY g.user_id ORDER BY g.hour_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS ffill_value
        |FROM g LEFT JOIN h ON h.user_id = g.user_id AND h.hour_us = g.hour_us
        |ORDER BY g.user_id, g.hour_us""".stripMargin,
    "q85_profile" ->
      """WITH c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |  CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal FROM customer),
        |p AS (
        | SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
        |  count(c_custkey) AS n_nonnull, count(DISTINCT c_custkey) AS ndv,
        |  CAST(min(c_custkey) AS VARCHAR) AS min_s,
        |  CAST(max(c_custkey) AS VARCHAR) AS max_s FROM c
        | UNION ALL
        | SELECT 'c_name', count(*), count(c_name), count(DISTINCT c_name),
        |  CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM c
        | UNION ALL
        | SELECT 'c_nationkey', count(*), count(c_nationkey),
        |  count(DISTINCT c_nationkey),
        |  CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR) FROM c
        | UNION ALL
        | SELECT 'c_mktsegment', count(*), count(c_mktsegment),
        |  count(DISTINCT c_mktsegment),
        |  CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM c
        | UNION ALL
        | SELECT 'c_acctbal', count(*), count(c_acctbal),
        |  count(DISTINCT c_acctbal),
        |  CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM c)
        |SELECT * FROM p ORDER BY column_name""".stripMargin,
    "q86_cdc_apply" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        | o_custkey
        |FROM orders WHERE o_orderkey % 5 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "q87_zorder" ->
      """WITH b AS (SELECT l_partkey % 1024 AS p, l_suppkey % 1024 AS sk FROM lineitem),
        |s0 AS (SELECT p, sk, p & 2097151 AS xa, sk & 2097151 AS xb FROM b),
        |s1 AS (SELECT p, sk, (xa | (xa << 16)) & 281470681808895 AS xa,
        |  (xb | (xb << 16)) & 281470681808895 AS xb FROM s0),
        |s2 AS (SELECT p, sk, (xa | (xa << 8)) & 71777214294589695 AS xa,
        |  (xb | (xb << 8)) & 71777214294589695 AS xb FROM s1),
        |s3 AS (SELECT p, sk, (xa | (xa << 4)) & 1085102592571150095 AS xa,
        |  (xb | (xb << 4)) & 1085102592571150095 AS xb FROM s2),
        |s4 AS (SELECT p, sk, (xa | (xa << 2)) & 3689348814741910323 AS xa,
        |  (xb | (xb << 2)) & 3689348814741910323 AS xb FROM s3),
        |s5 AS (SELECT p, sk, (xa | (xa << 1)) & 6148914691236517205 AS xa,
        |  (xb | (xb << 1)) & 6148914691236517205 AS xb FROM s4),
        |z AS (SELECT p, sk, (xa | (xb << 1)) >> 12 AS zbin FROM s5)
        |SELECT zbin, count(*) AS n, min(p) AS min_p, max(p) AS max_p,
        | min(sk) AS min_s, max(sk) AS max_s
        |FROM z GROUP BY zbin ORDER BY zbin""".stripMargin,
    "q88_debounce" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |l AS (SELECT event_id, user_id, event_type, us,
        |  lag(us) OVER (PARTITION BY user_id, event_type
        |                ORDER BY us, event_id) AS prev_us FROM ev)
        |SELECT event_id, user_id, event_type, us FROM l
        |WHERE prev_us IS NULL OR us - prev_us >= 7200000000
        |ORDER BY event_id""".stripMargin,
    "q89_kmeans" -> {
      // one Lloyd's round: assign to argmax cosine (ties → lowest cid),
      // then per-dim DECIMAL-exact mean; empty clusters keep their centroid
      def round(i: Int): String = {
        val (prev, a, u, c) = (s"c${i - 1}", s"a$i", s"u$i", s"c$i")
        s"""$a AS (SELECT pid, v, cid FROM (
           |  SELECT p.pid, p.v, $prev.cid,
           |   row_number() OVER (PARTITION BY p.pid
           |    ORDER BY ${sqlCosine("p.v", s"$prev.c")} DESC, $prev.cid) AS rn
           |  FROM pts p, $prev) WHERE rn = 1),
           |$u AS (SELECT cid, dim,
           |  CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS m
           | FROM (SELECT cid, generate_subscripts(v, 1) AS dim, unnest(v) AS x
           |       FROM $a) GROUP BY cid, dim),
           |$c AS (SELECT cid, list(m ORDER BY dim) AS c FROM $u GROUP BY cid
           | UNION ALL SELECT cid, c FROM $prev
           |  WHERE cid NOT IN (SELECT cid FROM $u))""".stripMargin
      }
      s"""WITH pts AS (SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |c0 AS (SELECT row_number() OVER (ORDER BY pid) AS cid, v AS c
         |  FROM (SELECT pid, v FROM pts ORDER BY pid LIMIT 4)),
         |${round(1)},
         |${round(2)},
         |af AS (SELECT pid, cid FROM (
         |  SELECT p.pid, c2.cid,
         |   row_number() OVER (PARTITION BY p.pid
         |    ORDER BY ${sqlCosine("p.v", "c2.c")} DESC, c2.cid) AS rn
         |  FROM pts p, c2) WHERE rn = 1),
         |n AS (SELECT cid, count(*) AS n_points FROM af GROUP BY cid)
         |SELECT cluster_id, n_points, dim, round(x, 6) AS value FROM (
         |  SELECT c2.cid AS cluster_id,
         |   coalesce(n.n_points, CAST(0 AS BIGINT)) AS n_points,
         |   CAST(generate_subscripts(c2.c, 1) AS BIGINT) AS dim,
         |   unnest(c2.c) AS x
         |  FROM c2 LEFT JOIN n ON n.cid = c2.cid)
         |ORDER BY cluster_id, dim""".stripMargin
    },
    "q90_source_mix" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len($SqlToks) AS BIGINT) AS n_tokens,
         |  md5(CAST(doc_id AS VARCHAR)) AS mix_hash
         | FROM documents WHERE source IN ('src0', 'src1', 'src2')),
         |p AS (SELECT doc_id, source, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY mix_hash, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |   AS tokens_before
         | FROM d)
         |SELECT doc_id, source, n_tokens, tokens_before FROM p
         |WHERE tokens_before < CASE source WHEN 'src0' THEN 800
         |  WHEN 'src1' THEN 800 ELSE 400 END
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
    "q94_video_frames" ->
      """WITH s AS (SELECT s_suppkey AS media_id FROM supplier
        |  WHERE s_suppkey % 4 = 0),
        |f AS (SELECT media_id,
        |  unnest(range(0, 6 + media_id % 5, 2)) AS frame_idx FROM s)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        | CAST(32 + (media_id % 3) * 16 AS BIGINT) AS width,
        | CAST(24 AS BIGINT) AS height,
        | CAST((media_id * 37 + frame_idx * 11) % 256 AS DOUBLE) AS mean_r,
        | CAST((media_id * 53 + frame_idx * 23) % 256 AS DOUBLE) AS mean_g,
        | CAST((media_id * 71 + frame_idx * 5) % 256 AS DOUBLE) AS mean_b
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
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
    "q97_embedding_clusters" ->
      s"""WITH RECURSIVE $SqlLshPairs,
         |pair AS (SELECT id1, id2 FROM p WHERE sim >= 0.99),
         |edge AS (SELECT id1 AS a, id2 AS b FROM pair
         | UNION SELECT id2 AS a, id1 AS b FROM pair),
         |reach(src, dst) AS (
         | SELECT a, a FROM edge
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN edge e ON e.a = r.dst),
         |lab AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src)
         |SELECT vec_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY vec_id""".stripMargin,

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

    "q99_pca_covariance" ->
      // DECIMAL(18,10)-quantized inputs; products carry scale 20
      // exactly in both engines (Spark DECIMAL(37,20), DuckDB (36,20)),
      // so the moment sums are bit-identical and the final double
      // arithmetic + round(6) is engine-independent.
      s"""WITH ex AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |         CAST(unnest(CAST(embedding AS DOUBLE[])) AS DECIMAL(18,10)) AS x
         |  FROM embeddings),
         |nn AS (SELECT count(*) AS n FROM embeddings),
         |s AS (SELECT i, CAST(sum(x) AS DOUBLE) AS sx FROM ex GROUP BY i),
         |p AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS DOUBLE) AS sxy
         |      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
         |      GROUP BY 1, 2)
         |SELECT p.i, p.j, round((sxy - si.sx * sj.sx / nn.n) / nn.n, 6) + 0.0 AS cov
         |FROM p
         |JOIN s si ON si.i = p.i
         |JOIN s sj ON sj.i = p.j
         |CROSS JOIN nn
         |ORDER BY p.i, p.j""".stripMargin,

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

    "q101_source_overlap" ->
      s"""WITH vocab AS (
         |  SELECT DISTINCT source AS g, unnest($SqlToks) AS w FROM documents),
         |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM vocab GROUP BY g),
         |pairs AS (
         |  SELECT a.g AS g_a, a.n AS vocab_a, b.g AS g_b, b.n AS vocab_b
         |  FROM sizes a JOIN sizes b ON a.g < b.g),
         |inter AS (
         |  SELECT a.g AS g_a, b.g AS g_b, CAST(count(*) AS BIGINT) AS common
         |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.g < b.g
         |  GROUP BY 1, 2)
         |SELECT p.g_a, p.g_b, p.vocab_a, p.vocab_b,
         |  coalesce(i.common, 0) AS common,
         |  round(CAST(coalesce(i.common, 0) AS DOUBLE) /
         |        CAST(p.vocab_a + p.vocab_b - coalesce(i.common, 0) AS DOUBLE), 6)
         |    + 0.0 AS jaccard
         |FROM pairs p LEFT JOIN inter i ON i.g_a = p.g_a AND i.g_b = p.g_b
         |ORDER BY p.g_a, p.g_b""".stripMargin,

    "q102_mutual_knn" -> {
      // replay knnEdgesLsh's banding: 24 planes, 6 bands x 4 bits,
      // candidates = pairs sharing ANY band key (equi-join on the
      // exploded (band_idx, key) rows — the same join the Spark plan
      // runs) AFTER dropping band buckets wider than the hot-bucket
      // cap (8192 — never binds at this sf, replayed for structural
      // parity), then each side's top-4 over its candidate set only.
      val (bitCols, bandCols) = sqlBandCols(24, 6)
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bits AS (SELECT vec_id, v,
         | $bitCols
         | FROM e),
         |band AS (SELECT vec_id, $bandCols FROM bits),
         |eb AS (SELECT vec_id, generate_subscripts(bk, 1) AS band_idx,
         |        unnest(bk) AS bkey
         |       FROM (SELECT vec_id, [b0, b1, b2, b3, b4, b5] AS bk FROM band)),
         |ebw AS (SELECT band_idx, bkey FROM eb
         |        GROUP BY band_idx, bkey HAVING count(*) <= 8192),
         |ebc AS (SELECT eb.vec_id, eb.band_idx, eb.bkey
         |        FROM eb JOIN ebw USING (band_idx, bkey)),
         |cand AS (SELECT DISTINCT a.vec_id AS qa, b.vec_id AS qb
         |         FROM ebc a JOIN ebc b ON a.band_idx = b.band_idx
         |          AND a.bkey = b.bkey AND a.vec_id <> b.vec_id),
         |s AS (SELECT cand.qa, cand.qb, ${sqlCosine("x.v", "y.v")} AS sim
         |      FROM cand JOIN e x ON x.vec_id = cand.qa
         |                JOIN e y ON y.vec_id = cand.qb),
         |r AS (SELECT qa, qb,
         |        row_number() OVER (PARTITION BY qa ORDER BY sim DESC, qb) AS rk
         |      FROM s),
         |knn AS (SELECT qa, qb FROM r WHERE rk <= 4),
         |mut AS (SELECT k1.qa AS id1, k1.qb AS id2 FROM knn k1
         |        JOIN knn k2 ON k1.qa = k2.qb AND k1.qb = k2.qa
         |        WHERE k1.qa < k1.qb),
         |edge AS (SELECT id1 AS a, id2 AS b FROM mut
         |         UNION SELECT id2 AS a, id1 AS b FROM mut),
         |reach(src, dst) AS (
         |  SELECT a, a FROM edge
         |  UNION
         |  SELECT r2.src, e2.b FROM reach r2 JOIN edge e2 ON e2.a = r2.dst),
         |lab AS (SELECT src AS vec_id, min(dst) AS cluster_id
         |        FROM reach GROUP BY src)
         |SELECT vec_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY vec_id""".stripMargin
    },

    "q103_dsir" ->
      // delta_b is ONE ln of a ratio of exact int64 products, rounded
      // to 6dp into DECIMAL; weights are DECIMAL sums -> the selection
      // order (w DESC, doc_id) is total and engine-independent.
      s"""WITH tok AS (SELECT doc_id, source = 'src0' AS tgt, $SqlToks AS t
         |            FROM documents),
         |uni AS (SELECT doc_id, tgt, unnest(t) AS f FROM tok),
         |big AS (SELECT doc_id, tgt, t[i] || ' ' || t[i+1] AS f
         |        FROM (SELECT doc_id, tgt, t,
         |                unnest(generate_series(1, len(t)-1)) AS i
         |              FROM tok WHERE len(t) >= 2)),
         |feats AS (SELECT doc_id, tgt,
         |    CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 64 AS b
         |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
         |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS tc
         |       FROM feats WHERE tgt GROUP BY b),
         |rc AS (SELECT b, CAST(count(*) AS BIGINT) AS rc
         |       FROM feats WHERE NOT tgt GROUP BY b),
         |tot AS (SELECT
         |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tt,
         |    CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS rr
         |  FROM feats),
         |d AS (SELECT rc.b,
         |    CAST(round(ln(CAST((coalesce(tc.tc, 0) + 1) * (rr + 64) AS DOUBLE)
         |               / CAST((rc.rc + 1) * (tt + 64) AS DOUBLE)), 6)
         |      AS DECIMAL(18,6)) AS delta
         |  FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot),
         |db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
         |       FROM feats WHERE NOT tgt GROUP BY doc_id, b),
         |sc AS (SELECT db.doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
         |         CAST(sum(c * delta) AS DECIMAL(28,6)) AS w
         |       FROM db JOIN d ON d.b = db.b GROUP BY db.doc_id),
         |wa AS (SELECT a.doc_id, coalesce(sc.n_feats, 0) AS n_feats,
         |         coalesce(sc.w, CAST(0 AS DECIMAL(28,6))) AS w
         |       FROM (SELECT doc_id FROM tok WHERE NOT tgt) a
         |       LEFT JOIN sc ON sc.doc_id = a.doc_id),
         |q AS (SELECT CAST(ceil(count(*) * 0.25) AS BIGINT) AS quota FROM wa),
         |r AS (SELECT doc_id, n_feats, w,
         |        row_number() OVER (ORDER BY w DESC, doc_id) AS sel_rank
         |      FROM wa)
         |SELECT doc_id, n_feats, CAST(w AS DOUBLE) + 0.0 AS weight,
         |  CAST(sel_rank AS BIGINT) AS sel_rank,
         |  sel_rank <= quota AS selected
         |FROM r CROSS JOIN q ORDER BY doc_id""".stripMargin,

    "q104_canonical_dedup" ->
      // q67's pair closure + q19's exact quality formula; the oracle's
      // partitioned row_number equals the engine's per-cluster arg-max
      // because the (quality desc, doc_id) order is total.
      s"""WITH RECURSIVE $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |edge AS (SELECT id1 AS a, id2 AS b FROM pair
         | UNION SELECT id2 AS a, id1 AS b FROM pair),
         |reach(src, dst) AS (
         | SELECT a, a FROM edge
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN edge e ON e.a = r.dst),
         |lab AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |        FROM reach GROUP BY src),
         |qual AS (SELECT c.doc_id,
         | least(CAST(len(t.toks) AS DOUBLE) / 100.0, 1.0) * 0.5
         | + (1.0 - (CASE WHEN length(c.text) = 0 THEN 0.0
         |    ELSE CAST(length(c.text) - length(regexp_replace(c.text,
         |           '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
         |         / CAST(length(c.text) AS DOUBLE) END)) * 0.25
         | + (CASE WHEN len(t.toks) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(t.toks, x -> x IN
         |           ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
         |         / CAST(len(t.toks) AS DOUBLE) END) * 0.25 AS quality
         | FROM corpus c JOIN tok t ON t.doc_id = c.doc_id),
         |m AS (SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
         |        q.quality
         |      FROM qual q LEFT JOIN lab l ON l.doc_id = q.doc_id),
         |r AS (SELECT doc_id, cluster_id, quality,
         |        row_number() OVER (PARTITION BY cluster_id
         |                           ORDER BY quality DESC, doc_id) AS rk
         |      FROM m)
         |SELECT doc_id, cluster_id, quality, rk = 1 AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "q105_kmv_sketch" ->
      // (k-1)·2^48 is an exact double (mantissa k-1), so the estimate
      // is the same three FP ops on both engines.
      s"""WITH v AS (SELECT DISTINCT source AS g, unnest($SqlToks) AS w
         |           FROM documents),
         |h AS (SELECT g, w,
         |        CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h FROM v),
         |r AS (SELECT g, h, w,
         |        row_number() OVER (PARTITION BY g ORDER BY h, w) AS rk
         |      FROM h),
         |topk AS (SELECT g, CAST(count(*) AS BIGINT) AS n_kept,
         |           max(h) AS kth_hash
         |         FROM r WHERE rk <= 64 GROUP BY g),
         |ex AS (SELECT g, CAST(count(*) AS BIGINT) AS exact_distinct
         |       FROM v GROUP BY g)
         |SELECT ex.g AS source, ex.exact_distinct, topk.n_kept, topk.kth_hash,
         |  CASE WHEN topk.n_kept < 64 THEN CAST(topk.n_kept AS DOUBLE)
         |       ELSE 63.0 * 281474976710656.0 / CAST(topk.kth_hash AS DOUBLE)
         |  END AS est_distinct
         |FROM ex JOIN topk ON topk.g = ex.g ORDER BY source""".stripMargin,

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

    "q108_lsh_recall" -> {
      // q23's banding chain at threshold 0.6 vs q24's exact pair set;
      // "precision" is quoted (DuckDB type keyword)
      val p = operators.TextDedup.MinhashPrime
      val sigCols = (0 until 12).map { j =>
        val (a, b) = operators.TextDedup.minhashParams(j)
        s"min(($a * hh + $b) % $p) AS s$j"
      }.mkString(",\n ")
      def bandExpr(cols: Seq[Int]): String =
        "md5(" + cols.map(j => s"CAST(s$j AS VARCHAR)").mkString(" || '|' || ") + ")"
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |hh0 AS (SELECT doc_id,
         |  CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % $p AS hh FROM s),
         |sig AS (SELECT doc_id, $sigCols FROM hh0 GROUP BY doc_id),
         |band AS (SELECT doc_id,
         | ${bandExpr(Seq(0, 1, 2))} AS b0,
         | ${bandExpr(Seq(3, 4, 5))} AS b1,
         | ${bandExpr(Seq(6, 7, 8))} AS b2,
         | ${bandExpr(Seq(9, 10, 11))} AS b3 FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         | FROM band a JOIN band b ON a.doc_id < b.doc_id
         |  AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |jacall AS (SELECT com.id1, com.id2,
         |  CAST(com.common AS DOUBLE) / CAST(n1.n + n2.n - com.common AS DOUBLE) AS jaccard
         | FROM com JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2),
         |exact AS (SELECT id1, id2 FROM jacall WHERE jaccard >= 0.6),
         |approx AS (SELECT c.id1, c.id2 FROM cand c
         | JOIN jacall j ON j.id1 = c.id1 AND j.id2 = c.id2
         | WHERE j.jaccard >= 0.6),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_approx FROM approx),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM
         |  (SELECT * FROM approx INTERSECT SELECT * FROM exact))
         |SELECT n_approx, n_exact, n_common,
         |  CASE WHEN n_approx = 0 THEN 1.0
         |    ELSE round(CAST(n_common AS DOUBLE) / CAST(n_approx AS DOUBLE), 6)
         |  END AS "precision",
         |  CASE WHEN n_exact = 0 THEN 1.0
         |    ELSE round(CAST(n_common AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
         |  END AS recall
         |FROM na CROSS JOIN ne CROSS JOIN nc""".stripMargin
    },

    "q109_mad_outliers" ->
      // med/mad are quantile_cont (bit-equal to exactQuantiles); the
      // 3·mad comparison uses the unrounded values on both engines.
      """WITH m AS (SELECT l_returnflag AS g,
        |  quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
        | FROM lineitem GROUP BY 1),
        |d AS (SELECT m.g, m.med,
        |  abs(CAST(l_extendedprice AS DOUBLE) - m.med) AS dev
        | FROM lineitem JOIN m ON m.g = l_returnflag),
        |md AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY g)
        |SELECT d.g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | round(min(d.med), 6) AS med, round(min(md.mad), 6) AS mad,
        | CAST(sum(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_outliers
        |FROM d JOIN md ON md.g = d.g
        |GROUP BY d.g ORDER BY l_returnflag""".stripMargin,

    "q110_bpe_encode" -> {
      // q98's 8 training rounds, then the encode chain unrolled: each
      // venc stage applies rule b_n to the distinct-word table exactly
      // as BpeEncoder's replace chain does.
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
    },

    "q111_weighted_sample" ->
      // lkey = round(ln(u)/w, 6) with u from the id hash and w the
      // UNROUNDED clamped quality; the published weight rounds after.
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |q AS (SELECT doc_id, greatest(
         |   least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.5
         |   + (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE CAST(length(text) - length(regexp_replace(text,
         |             '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
         |           / CAST(length(text) AS DOUBLE) END)) * 0.25
         |   + (CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE CAST(len(list_filter(toks, x -> x IN
         |             ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
         |           / CAST(len(toks) AS DOUBLE) END) * 0.25, 0.05) AS w
         |  FROM t),
         |k AS (SELECT doc_id, w,
         |   round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
         |               AS BIGINT) + 1) / 281474976710657.0) / w, 6) AS lkey
         |  FROM q),
         |r AS (SELECT doc_id, w, lkey,
         |        row_number() OVER (ORDER BY lkey DESC, doc_id) AS sel_rank
         |      FROM k)
         |SELECT doc_id, round(w, 6) AS weight, lkey,
         |  CAST(sel_rank AS BIGINT) AS sel_rank, sel_rank <= 100 AS selected
         |FROM r ORDER BY doc_id""".stripMargin,

    "q112_event_transitions" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |l AS (SELECT event_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |                         ORDER BY us, event_id) AS next_type
        | FROM ev),
        |tr AS (SELECT event_type AS from_type, next_type AS to_type,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM l WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        |        FROM tr GROUP BY from_type)
        |SELECT tr.from_type, tr.to_type, tr.n,
        |  round(CAST(tr.n AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6) AS prob
        |FROM tr JOIN tot ON tot.from_type = tr.from_type
        |ORDER BY tr.from_type, tr.to_type""".stripMargin,

    "q113_dup_provenance" ->
      // q24's exact pair set, attributed to source pairs via the base
      // doc id (synthetic copies map back with % 1000000)
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |attr AS (SELECT least(d1.source, d2.source) AS src_a,
         |                greatest(d1.source, d2.source) AS src_b
         |  FROM pair
         |  JOIN documents d1 ON d1.doc_id = pair.id1 % 1000000
         |  JOIN documents d2 ON d2.doc_id = pair.id2 % 1000000)
         |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM attr GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    "q114_decayed_engagement" ->
      // decay factor rounded to 6dp, times DECIMAL(18,2) values,
      // summed in DECIMAL — exact totals on both engines.
      """WITH ev AS (SELECT user_id,
        |  CAST(value AS DECIMAL(18,2)) AS v,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |a AS (SELECT max(us) AS anchor FROM ev),
        |t AS (SELECT user_id, v,
        |  CAST(round(exp(CAST(us - anchor AS DOUBLE) / 604800000000.0), 6)
        |       AS DECIMAL(18,6)) AS w
        | FROM ev CROSS JOIN a)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(v * w) AS DOUBLE) + 0.0 AS decayed_value
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q115_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) // 604800000000 AS week
        | FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
        |s AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        |      FROM c GROUP BY cohort_week),
        |m AS (SELECT c.cohort_week, uw.week - c.cohort_week AS weeks_since,
        |        CAST(count(*) AS BIGINT) AS n_active
        |      FROM uw JOIN c ON c.user_id = uw.user_id
        |      GROUP BY 1, 2)
        |SELECT m.cohort_week, m.weeks_since, m.n_active, s.cohort_size,
        |  round(CAST(m.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 6)
        |    AS retention
        |FROM m JOIN s ON s.cohort_week = m.cohort_week
        |ORDER BY m.cohort_week, m.weeks_since""".stripMargin,

    "q116_simhash_pairs" ->
      // byte-band candidates + exact bit_count(xor) verify; SqlSimhash
      // mirrors the native expression bit-for-bit (q25's pin)
      s"""WITH $SqlCorpus,
         |tok AS (SELECT doc_id, $SqlToks AS toks FROM corpus),
         |shs AS (SELECT doc_id, CAST($SqlSimhash AS BIGINT) AS sh FROM tok),
         |banded AS (SELECT doc_id, sh, b, (sh >> (b * 8)) & 255 AS key
         |  FROM shs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         |    bit_count(xor(a.sh, b.sh)) AS hamming
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3)
         |SELECT id1, id2, CAST(hamming AS BIGINT) AS hamming
         |FROM cand ORDER BY id1, id2""".stripMargin,

    "q117_heavy_hitters" ->
      // exact threshold set: the MG pass only prunes candidates, so
      // the oracle is a plain HAVING over exact counts
      s"""WITH tok AS (SELECT unnest($SqlToks) AS token FROM documents)
         |SELECT token, CAST(count(*) AS BIGINT) AS n
         |FROM tok GROUP BY token
         |HAVING count(*) >= (SELECT greatest(count(*) // 200, 1) FROM tok)
         |ORDER BY token""".stripMargin,

    "q118_sessions" ->
      // NULL lag (first event per user) falls to the ELSE 1 branch on
      // both engines; (us, event_id) makes the within-user order total
      """WITH ev AS (SELECT user_id, event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |         <= 1800000000 THEN 0 ELSE 1 END AS is_new
        | FROM ev),
        |g AS (SELECT user_id, us,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        | FROM f)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  max(us) - min(us) AS duration_us
        |FROM g GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q119_triangles" ->
      // same lower-to-higher orientation as the operator: each
      // triangle counted once, at its minimum vertex
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS lo, b.pk AS hi
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |w AS (SELECT ab.hi AS lo, ac.hi AS hi
        |      FROM e ab JOIN e ac ON ab.lo = ac.lo AND ab.hi < ac.hi)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM
        |    (SELECT lo AS n FROM e UNION SELECT hi FROM e)) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w
        |   WHERE EXISTS (SELECT 1 FROM e WHERE e.lo = w.lo AND e.hi = w.hi))
        |    AS n_triangles""".stripMargin,

    "q120_resample" ->
      """WITH ev AS (SELECT user_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) // 86400000000 AS day
        | FROM events),
        |sp AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
        |         FROM (SELECT DISTINCT user_id FROM ev) CROSS JOIN sp),
        |c AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n
        |      FROM ev GROUP BY user_id, day)
        |SELECT g.user_id, g.day, coalesce(c.n, CAST(0 AS BIGINT)) AS n_events
        |FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.day = g.day
        |ORDER BY g.user_id, g.day""".stripMargin,

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

    "q128_association_rules" ->
      // all metrics exact ppm integers (floor division) — no floats
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
        |isup AS (SELECT pk, CAST(count(*) AS BIGINT) AS sup FROM li GROUP BY pk),
        |psup AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_both
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= 2)
        |SELECT pa, pb, n_both, sa.sup AS sup_a, sb.sup AS sup_b,
        |  (1000000 * n_both) // sa.sup AS conf_ab_ppm,
        |  (1000000 * n_both) // sb.sup AS conf_ba_ppm,
        |  CAST((CAST(n.n_orders AS HUGEINT) * n_both * 1000000)
        |    // (CAST(sa.sup AS HUGEINT) * sb.sup) AS BIGINT) AS lift_ppm
        |FROM psup
        |JOIN isup sa ON sa.pk = pa
        |JOIN isup sb ON sb.pk = pb
        |CROSS JOIN n
        |ORDER BY lift_ppm DESC, pa, pb LIMIT 30""".stripMargin,

    "q133_psi_drift" ->
      // edges = round(quantile, 6) on BOTH engines → identical bin
      // boundaries; smoothed proportions; ln rounded per term
      """WITH ev AS (SELECT
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, value
        | FROM events),
        |t0 AS (SELECT min(us) AS t0 FROM ev),
        |tagged AS (SELECT
        |  CASE WHEN us < t0 + 604800000000 THEN 'A' ELSE 'B' END AS period,
        |  value FROM ev CROSS JOIN t0),
        |ed AS (SELECT list_transform(
        |    quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    x -> round(x, 6)) AS edges
        |  FROM tagged WHERE period = 'A'),
        |binned AS (SELECT period,
        |  CAST(len(list_filter(edges, e -> value > e)) AS BIGINT) AS bin
        | FROM tagged CROSS JOIN ed),
        |counts AS (SELECT period, bin, CAST(count(*) AS BIGINT) AS n
        |           FROM binned GROUP BY period, bin),
        |bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |j AS (SELECT b.bin, coalesce(a.n, CAST(0 AS BIGINT)) AS n_a,
        |        coalesce(bb.n, CAST(0 AS BIGINT)) AS n_b
        |      FROM bins b
        |      LEFT JOIN counts a ON a.period = 'A' AND a.bin = b.bin
        |      LEFT JOIN counts bb ON bb.period = 'B' AND bb.bin = b.bin),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |        CAST(sum(n_b) AS BIGINT) AS tb FROM j),
        |terms AS (SELECT bin, n_a, n_b,
        |  CAST(n_a + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE) AS pa,
        |  CAST(n_b + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE) AS pb
        | FROM j CROSS JOIN tot),
        |t2 AS (SELECT bin, n_a, n_b,
        |  round((pb - pa) * round(ln(pb / pa), 6), 6) AS psi_term FROM terms),
        |tt AS (SELECT CAST(sum(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE) + 0.0
        |         AS psi_total FROM t2)
        |SELECT bin, n_a, n_b, psi_term, psi_total FROM t2 CROSS JOIN tt
        |ORDER BY bin""".stripMargin,

    "q134_communities" -> {
      // replay 5 synchronous LPA rounds: each round joins the previous
      // labeling onto the mirrored edge list, counts neighbor labels,
      // and takes (count desc, label asc) per node — the operator's
      // min(struct) arg-max expressed as a window rank
      val rounds = (1 to 5).map { r =>
        s"""g$r AS (SELECT e.src AS node, l.label, count(*) AS c
           |  FROM e JOIN l${r - 1} l ON l.node = e.dst GROUP BY 1, 2),
           |l$r AS (SELECT node, label FROM (
           |  SELECT node, label,
           |    row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rk
           |  FROM g$r) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e0 AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
         |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         |$rounds,
         |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS community_size
         |       FROM l5 GROUP BY label)
         |SELECT l.node, l.label AS community, sz.community_size
         |FROM l5 l JOIN sz ON sz.label = l.label
         |ORDER BY l.node""".stripMargin
    },

    "q135_rolling_anomaly" ->
      // integer-cents arithmetic end to end: the 3-sigma test is the
      // cross-multiplied comparison (n·v − s)² > 9·(n·q − s²), exact
      // in BIGINT/HUGEINT — no float ever enters the flag
      """WITH ev AS (SELECT user_id, event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, value,
        |  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |w AS (SELECT user_id, event_id, us, value, vc,
        |  count(*) OVER win AS n,
        |  sum(vc) OVER win AS sv,
        |  sum(vc * vc) OVER win AS qv
        | FROM ev
        | WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |   ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, us, value, CAST(n AS BIGINT) AS window_n
        |FROM w
        |WHERE n >= 4
        |  AND (n*vc - sv)*(n*vc - sv) > 9*(n*qv - sv*sv)
        |ORDER BY user_id, us, event_id""".stripMargin,

    "q136_changepoint" ->
      // scaled cusum n·run_k − k·S in integer cents; argmax on the
      // exact statistic, ties to the earliest (us, event_id)
      """WITH ev AS (SELECT user_id, event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |r AS (SELECT user_id, event_id, us, vc,
        |  count(*) OVER win AS k, sum(vc) OVER win AS run
        | FROM ev
        | WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT user_id, max(k) AS n_events, sum(vc) AS s_total
        |      FROM r GROUP BY user_id),
        |c AS (SELECT r.user_id, r.event_id, r.us, r.k, t.n_events,
        |        abs(t.n_events * r.run - r.k * t.s_total) AS acusum
        |      FROM r JOIN t USING (user_id) WHERE r.k < t.n_events),
        |m AS (SELECT user_id, event_id, k, acusum, n_events,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY acusum DESC, us, event_id) AS rk
        |      FROM c)
        |SELECT user_id, event_id AS cp_event_id, CAST(k AS BIGINT) AS cp_index,
        |  CAST(acusum AS BIGINT) AS cusum_abs, CAST(n_events AS BIGINT) AS n_events
        |FROM m WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "q137_purged_split" ->
      // ceil(p·n) as exact integer rank arithmetic; a global
      // row_number stands in for the distributed ordinal (rank-equal)
      """WITH ev AS (SELECT event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |n AS (SELECT count(*) AS c FROM ev),
        |r AS (SELECT us, row_number() OVER (ORDER BY us, event_id) AS i FROM ev),
        |c1 AS (SELECT max(us) AS cut1 FROM r CROSS JOIN n
        |       WHERE i <= (7 * c + 9) // 10),
        |c2 AS (SELECT max(us) AS cut2 FROM r CROSS JOIN n
        |       WHERE i <= (17 * c + 19) // 20)
        |SELECT split, CAST(count(*) AS BIGINT) AS n,
        |  min(us) AS min_us, max(us) AS max_us
        |FROM (SELECT us,
        |  CASE WHEN abs(us - cut1) <= 86400000000
        |         OR abs(us - cut2) <= 86400000000 THEN 'embargo'
        |       WHEN us < cut1 THEN 'train'
        |       WHEN us < cut2 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM ev CROSS JOIN c1 CROSS JOIN c2)
        |GROUP BY split ORDER BY split""".stripMargin,

    "q138_target_encode" ->
      // floor divisions of cross-multiplied integer sums — DuckDB's
      // HUGEINT sum() keeps every product exact, mirroring the Spark
      // DECIMAL(38,0) div
      """WITH o AS (SELECT o_orderkey, c_nationkey AS nation,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS x_cents
        | FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
        |        sum(x_cents) AS s_g FROM o GROUP BY nation),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
        |        sum(x_cents) AS s_all FROM o)
        |SELECT o.o_orderkey, o.nation, o.x_cents,
        |  CAST(CASE WHEN g.n_g > 1
        |    THEN (g.s_g - o.x_cents) // (g.n_g - 1) END AS BIGINT) AS loo_cents,
        |  CAST((t.n_all * (g.s_g - o.x_cents) + 10 * t.s_all)
        |    // (t.n_all * (g.n_g - 1 + 10)) AS BIGINT) AS loo_smooth_cents
        |FROM o JOIN g USING (nation) CROSS JOIN t
        |ORDER BY o.o_orderkey""".stripMargin,

    "q139_hard_negatives" ->
      // per-query top-3 TF terms, then the q121 BM25 expression tree
      // joined through the query-term list; self excluded, top-10
      s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS term FROM documents),
         |qt AS (SELECT doc_id AS query_id, term FROM (
         |  SELECT doc_id, term, count(*) AS tf,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY count(*) DESC, term) AS rk
         |  FROM tok WHERE doc_id < 5 GROUP BY doc_id, term) WHERE rk <= 3),
         |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
         |         FROM tok GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_len
         |       FROM lens),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
         |       WHERE term IN (SELECT term FROM qt)
         |       GROUP BY doc_id, term),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id, tf.term,
         |    CAST(round(
         |      round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
         |               (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) *
         |      (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         |      (CAST(tf AS DOUBLE) +
         |       1.2 * (1.0 - 0.75 + 0.75 * CAST(len AS DOUBLE) / avg_len)), 6)
         |      AS DECIMAL(18,6)) AS ts
         |  FROM tf JOIN dfq ON dfq.term = tf.term
         |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN st),
         |qs AS (SELECT qt.query_id, sc.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_terms_hit,
         |    CAST(sum(sc.ts) AS DOUBLE) AS score
         |  FROM sc JOIN qt ON qt.term = sc.term
         |  WHERE sc.doc_id <> qt.query_id
         |  GROUP BY qt.query_id, sc.doc_id),
         |rk AS (SELECT query_id, doc_id, n_terms_hit, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |  FROM qs)
         |SELECT query_id, rank, doc_id, n_terms_hit, score
         |FROM rk WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "q141_silence_spans" ->
      // burst geometry replayed analytically: a 160-sample frame is
      // silent iff its first and last samples fall in the SAME burst
      // and that burst index is odd (bursts alternate active/silent);
      // spans are the standard gaps-and-islands rewrite
      """WITH m AS (SELECT s_suppkey AS media_id,
        |    4000 + s_suppkey % 50 * 100 AS n_samples,
        |    400 + s_suppkey % 5 * 80 AS blen
        |  FROM supplier WHERE s_suppkey % 3 = 0),
        |f AS (SELECT media_id, blen, n_samples,
        |    unnest(generate_series(0, (n_samples + 159) // 160 - 1)) AS frame_idx
        |  FROM m),
        |fl AS (SELECT media_id, frame_idx,
        |    (160 * frame_idx) // blen AS s0,
        |    (least(160 * frame_idx + 160, n_samples) - 1) // blen AS s1
        |  FROM f),
        |sil AS (SELECT media_id, frame_idx FROM fl
        |        WHERE s0 = s1 AND s0 % 2 = 1),
        |isl AS (SELECT media_id, frame_idx,
        |    frame_idx - row_number() OVER (PARTITION BY media_id
        |      ORDER BY frame_idx) AS grp
        |  FROM sil),
        |sp AS (SELECT media_id, min(frame_idx) AS start_frame,
        |    max(frame_idx) AS end_frame, CAST(count(*) AS BIGINT) AS n_frames
        |  FROM isl GROUP BY media_id, grp)
        |SELECT media_id,
        |  CAST(row_number() OVER (PARTITION BY media_id ORDER BY start_frame)
        |    AS BIGINT) AS span_idx,
        |  start_frame, end_frame, n_frames
        |FROM sp ORDER BY media_id, span_idx""".stripMargin,

    "q142_image_dhash" ->
      // every hash bit replayed from the fixture's cell formula: the
      // planted +1 shift cancels out of all adjacent-cell comparisons,
      // so hashing the shared seed reproduces both pair members' dHash
      """WITH keys AS (SELECT p_partkey AS k, p_partkey - p_partkey % 10 AS kb
        |  FROM part WHERE p_partkey % 5 = 0),
        |g AS (SELECT DISTINCT kb FROM keys),
        |cells AS (SELECT kb, gx, gy
        |  FROM g CROSS JOIN range(9) t1(gx) CROSS JOIN range(8) t2(gy)),
        |vals AS (SELECT kb, gx, gy,
        |    (kb*31 + gx*17 + gy*29 + gx*gy*7
        |     + (kb % 251)*gx*13 + (kb % 241)*gy*11) % 255 AS v
        |  FROM cells),
        |bits AS (SELECT a.kb, a.gy*8 + a.gx AS i,
        |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM vals a JOIN vals b
        |    ON b.kb = a.kb AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |hs AS (SELECT kb,
        |    CAST(SUM(CASE WHEN i >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT)
        |      AS hash_hi,
        |    CAST(SUM(CASE WHEN i < 32
        |      THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
        |      AS hash_lo
        |  FROM bits GROUP BY kb),
        |h AS (SELECT keys.k, hs.hash_hi, hs.hash_lo
        |  FROM keys JOIN hs ON hs.kb = keys.kb)
        |SELECT a.k AS id_a, b.k AS id_b, a.hash_hi, a.hash_lo
        |FROM h a JOIN h b
        |  ON a.hash_hi = b.hash_hi AND a.hash_lo = b.hash_lo AND a.k < b.k
        |ORDER BY id_a, id_b""".stripMargin,

    "q140_clustering_coeff" ->
      // unoriented wedge join (apex = min id) — per-triangle corner
      // credit is orientation-independent, so it must agree with the
      // operator's degree-oriented enumeration
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS lo, b.pk AS hi
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |w AS (SELECT ab.lo AS u, ab.hi AS v, ac.hi AS wv
        |      FROM e ab JOIN e ac ON ab.lo = ac.lo AND ab.hi < ac.hi),
        |t AS (SELECT u, v, wv FROM w
        |      WHERE EXISTS (SELECT 1 FROM e WHERE e.lo = w.v AND e.hi = w.wv)),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
        |        SELECT u AS node FROM t
        |        UNION ALL SELECT v FROM t
        |        UNION ALL SELECT wv FROM t) GROUP BY node),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |        SELECT lo AS node FROM e UNION ALL SELECT hi FROM e)
        |        GROUP BY node)
        |SELECT d.node, d.deg, coalesce(pn.tri, CAST(0 AS BIGINT)) AS n_triangles,
        |  CASE WHEN d.deg >= 2 THEN CAST(
        |    (2000000 * coalesce(pn.tri, 0)) // (d.deg * (d.deg - 1)) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS clustering_ppm
        |FROM deg d LEFT JOIN pn ON pn.node = d.node
        |ORDER BY d.node""".stripMargin,

    "q131_survival" ->
      // KM product via round(ln(1-d/n),6) DECIMAL sums, exp once;
      // explicit 0 after a stratum exhausts its risk set
      """WITH ev AS (SELECT user_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |a AS (SELECT max(us) AS end_us FROM ev),
        |life AS (SELECT (max(us) - min(us)) // 86400000000 AS t,
        |  (SELECT end_us FROM a) - max(us) < 604800000000 AS censored
        | FROM ev GROUP BY user_id),
        |st AS (SELECT t,
        |  CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
        |  CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
        | FROM life GROUP BY t),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM life),
        |r AS (SELECT t, d, c,
        |  n_total - CAST(coalesce(sum(d + c) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS n_risk
        | FROM st CROSS JOIN tot),
        |r2 AS (SELECT t, d, c, n_risk,
        |  CAST(min(CASE WHEN d < n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS alive,
        |  sum(CASE WHEN d < n_risk THEN
        |      CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 6)
        |        AS DECIMAL(18,6)) ELSE NULL END)
        |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS ls
        | FROM r)
        |SELECT t AS t_days, n_risk, d, c,
        |  CASE WHEN alive = 1 THEN round(exp(CAST(ls AS DOUBLE)), 6)
        |       ELSE 0.0 END AS surv
        |FROM r2 ORDER BY t_days""".stripMargin,

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

    "q129_gini" ->
      // every term integer; the one division is floor DIV — no floats
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY user_id),
        |r AS (SELECT x,
        |  CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(x) AS BIGINT) AS n_events,
        |  CAST(((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000)
        |    // (count(*) * sum(x)) AS BIGINT) AS gini_ppm
        |FROM r""".stripMargin,

    "q130_ab_test" ->
      // DECIMAL-exact sums; each double is one fixed tree, rounded 6dp
      """WITH ev AS (SELECT
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |         AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |  CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |         sum(v) AS s, sum(v * v) AS ss FROM ev GROUP BY arm),
        |a AS (SELECT n AS n_a, s AS s_a, ss AS ss_a FROM arms WHERE arm = 'A'),
        |b AS (SELECT n AS n_b, s AS s_b, ss AS ss_b FROM arms WHERE arm = 'B'),
        |x AS (SELECT n_a, n_b,
        |  CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        |  CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        |  (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
        |     / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
        |  (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
        |     / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
        | FROM a CROSS JOIN b)
        |SELECT n_a, n_b, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
        |  round(var_a, 6) AS var_a, round(var_b, 6) AS var_b,
        |  round((mean_a - mean_b) /
        |    sqrt(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)), 6)
        |    AS t_welch
        |FROM x""".stripMargin,

    "q126_leakage_split" ->
      // q67's recursive-closure labels + q58's md5 bucket, composed:
      // the cluster-keyed split can never separate a near-dup pair
      s"""WITH RECURSIVE $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |edge AS (SELECT id1 AS a, id2 AS b FROM pair
         | UNION SELECT id2 AS a, id1 AS b FROM pair),
         |reach(src, dst) AS (
         | SELECT a, a FROM edge
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN edge e ON e.a = r.dst),
         |lab AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |fl AS (SELECT c.doc_id, coalesce(l.cluster_id, c.doc_id) AS cluster_id
         | FROM (SELECT doc_id FROM corpus) c LEFT JOIN lab l ON l.doc_id = c.doc_id),
         |asg AS (SELECT doc_id, cluster_id,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
         |       WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
         |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS doc_split
         | FROM fl),
         |aud AS (SELECT
         |  CAST(coalesce(sum(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS cross_pairs_cluster_split,
         |  CAST(coalesce(sum(CASE WHEN a1.doc_split <> a2.doc_split THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS cross_pairs_doc_split
         | FROM pair JOIN asg a1 ON a1.doc_id = pair.id1
         |           JOIN asg a2 ON a2.doc_id = pair.id2)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         |  cross_pairs_cluster_split, cross_pairs_doc_split
         |FROM asg CROSS JOIN aud
         |GROUP BY split, cross_pairs_cluster_split, cross_pairs_doc_split
         |ORDER BY split""".stripMargin,

    "q123_scd2" ->
      """WITH ev AS (SELECT user_id, event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, event_type
        | FROM events),
        |ch AS (SELECT user_id, event_id, us, event_type FROM (
        |  SELECT user_id, event_id, us, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev
        |  FROM ev) WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version_no,
        |  event_type, us AS valid_from_us,
        |  coalesce(lead(us) OVER w, 253402300799000000) AS valid_to_us
        |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, version_no""".stripMargin,

    "q143_fuzzy_blocking" ->
      // edit distance is exact Wagner–Fischer on both engines; the
      // blocking key + length band are pure pruning, so the plain
      // block-join replay is value-identical
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q144_bfs_reach" ->
      // fixed-depth BFS unrolled as one level CTE per hop with
      // NOT-IN visited pruning — min-hop semantics are exact at
      // depth 3, no recursion needed
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |sup AS (SELECT a.pk AS pa, b.pk AS pb
        |        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |        GROUP BY a.pk, b.pk HAVING count(*) >= 2),
        |adj AS (SELECT pa AS u, pb AS v FROM sup
        |        UNION SELECT pb, pa FROM sup),
        |l0 AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS node
        |       FROM part WHERE p_partkey % 500 = 0),
        |l1 AS (SELECT DISTINCT CAST(adj.v AS BIGINT) AS node
        |       FROM adj JOIN l0 ON adj.u = l0.node
        |       WHERE adj.v NOT IN (SELECT node FROM l0)),
        |l2 AS (SELECT DISTINCT CAST(adj.v AS BIGINT) AS node
        |       FROM adj JOIN l1 ON adj.u = l1.node
        |       WHERE adj.v NOT IN (SELECT node FROM l0)
        |         AND adj.v NOT IN (SELECT node FROM l1)),
        |l3 AS (SELECT DISTINCT CAST(adj.v AS BIGINT) AS node
        |       FROM adj JOIN l2 ON adj.u = l2.node
        |       WHERE adj.v NOT IN (SELECT node FROM l0)
        |         AND adj.v NOT IN (SELECT node FROM l1)
        |         AND adj.v NOT IN (SELECT node FROM l2))
        |SELECT node, hop FROM (
        |  SELECT node, CAST(0 AS BIGINT) AS hop FROM l0
        |  UNION ALL SELECT node, CAST(1 AS BIGINT) FROM l1
        |  UNION ALL SELECT node, CAST(2 AS BIGINT) FROM l2
        |  UNION ALL SELECT node, CAST(3 AS BIGINT) FROM l3)
        |ORDER BY node""".stripMargin,

    "q145_funnel" ->
      // stage k = min-agg over events strictly after the user's
      // stage-(k-1) time; conversion is exact integer ppm (ordering
      // is unit-invariant, so µs here vs ns in Spark is immaterial)
      """WITH ev AS (SELECT user_id AS u, event_type AS t,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
        |  FROM events),
        |s0 AS (SELECT u, min(us) AS ts FROM ev WHERE t = 'view' GROUP BY u),
        |s1 AS (SELECT ev.u, min(ev.us) AS ts FROM ev JOIN s0 ON ev.u = s0.u
        |       WHERE ev.t = 'click' AND ev.us > s0.ts GROUP BY ev.u),
        |s2 AS (SELECT ev.u, min(ev.us) AS ts FROM ev JOIN s1 ON ev.u = s1.u
        |       WHERE ev.t = 'purchase' AND ev.us > s1.ts GROUP BY ev.u),
        |c AS (SELECT 0 AS i, 'view' AS stage, (SELECT count(*) FROM s0) AS n
        |  UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2))
        |SELECT CAST(i AS BIGINT) AS stage_idx, stage,
        |  CAST(n AS BIGINT) AS n_users,
        |  CAST(CASE WHEN i = 0 THEN 1000000
        |       WHEN lag(n) OVER (ORDER BY i) = 0 THEN 0
        |       ELSE n * 1000000 // lag(n) OVER (ORDER BY i) END AS BIGINT)
        |    AS conv_ppm
        |FROM c ORDER BY stage_idx""".stripMargin,

    "q146_twa" ->
      // value×duration accumulates in exact DECIMAL on both engines;
      // the one double division at the end is IEEE-deterministic
      """WITH ev AS (SELECT user_id AS u,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
        |    CAST(value AS DECIMAL(9,2)) AS v FROM events),
        |d AS (SELECT u, us, v,
        |    lead(us) OVER (PARTITION BY u ORDER BY us) - us AS dur FROM ev),
        |f AS (SELECT * FROM d WHERE dur IS NOT NULL)
        |SELECT u AS user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
        |  CAST(sum(dur) AS BIGINT) AS span_us,
        |  round(CAST(sum(v * CAST(dur AS DECIMAL(18,0))) AS DOUBLE)
        |    / CAST(sum(dur) AS DOUBLE), 6) AS twa
        |FROM f GROUP BY u ORDER BY user_id""".stripMargin,

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
    // surviving neighbors, restrict edges to kept endpoints"
    "q148_kcore_peel" -> kcorePeelSql(rounds = 12, k = 3),
    "q218_ktruss_peel" -> kTrussSql(rounds = 2, k = 7),
    "q219_asof_forward" ->
      // DuckDB native FORWARD ASOF: earliest view at-or-after the click
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts <= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q149_scene_change" ->
      // frame colors replayed from the fixture formula (solid lossless
      // frames => decoded means ARE the colors); cuts + gaps-islands
      """WITH m AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier
        |           WHERE s_suppkey % 5 = 1),
        |f AS (SELECT k, unnest(generate_series(0,
        |        CAST(12 + k % 7 AS INT) - 1)) AS fi FROM m),
        |c AS (SELECT k AS media_id, fi AS frame_idx,
        |    (k * 37 + (fi // (3 + k % 3)) * 89) % 254 + fi % 2 AS r,
        |    (k * 53 + (fi // (3 + k % 3)) * 131) % 254 + fi % 2 AS g,
        |    (k * 71 + (fi // (3 + k % 3)) * 17) % 254 + fi % 2 AS b
        |  FROM f),
        |d AS (SELECT media_id, frame_idx,
        |    abs(r - lag(r) OVER w) + abs(g - lag(g) OVER w)
        |      + abs(b - lag(b) OVER w) AS delta
        |  FROM c WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
        |sc AS (SELECT media_id, frame_idx,
        |    sum(CASE WHEN delta IS NULL OR delta > 30 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY media_id ORDER BY frame_idx) AS scene_idx
        |  FROM d)
        |SELECT media_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        |  CAST(min(frame_idx) AS BIGINT) AS start_frame,
        |  CAST(max(frame_idx) AS BIGINT) AS end_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames
        |FROM sc GROUP BY media_id, scene_idx
        |ORDER BY media_id, scene_idx""".stripMargin,

    "q150_hll_sketch" ->
      // registers replayed bit-for-bit on the md5-48 line; the harmonic
      // sum is the exact integer sum of 2^(49-rho); constants fold
      // left-assoc identically in both engines
      s"""WITH v AS (SELECT source AS g, unnest($SqlToks) AS w FROM documents),
         |h AS (SELECT g, w,
         |        CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h FROM v),
         |r AS (SELECT g, h % 64 AS bucket,
         |    CASE WHEN h // 64 = 0 THEN 43
         |         ELSE 43 - length(bin(h // 64)) END AS rho
         |  FROM h),
         |reg AS (SELECT g, bucket, max(rho) AS rho FROM r GROUP BY g, bucket),
         |s AS (SELECT g, CAST(count(*) AS BIGINT) AS nb,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(49 - rho AS INT)) AS BIGINT)
         |      AS sp
         |  FROM reg GROUP BY g),
         |e AS (SELECT g, CAST(64 - nb AS BIGINT) AS n_zero,
         |    sp + CAST(64 - nb AS BIGINT) * CAST(562949953421312 AS BIGINT)
         |      AS s_scaled FROM s),
         |est AS (SELECT g, n_zero, CAST(s_scaled AS BIGINT) AS s_scaled,
         |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |      * CAST(562949953421312 AS DOUBLE) / CAST(s_scaled AS DOUBLE)
         |      AS raw FROM e),
         |ex AS (SELECT g, CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
         |       FROM v GROUP BY g)
         |SELECT est.g AS source, CAST(n_zero AS BIGINT) AS n_zero, s_scaled,
         |  round(CASE WHEN raw <= 160.0 AND n_zero > 0
         |    THEN 64.0 * ln(64.0 / CAST(n_zero AS DOUBLE)) ELSE raw END, 6)
         |    AS est_distinct,
         |  ex.exact_distinct
         |FROM est JOIN ex ON ex.g = est.g ORDER BY source""".stripMargin,

    "q151_woe_binning" ->
      // bin membership is integer rank arithmetic under the same total
      // order — no quantile interpolation crosses engines
      """WITH rk AS (SELECT l_extendedprice AS v, l_returnflag = 'R' AS bad,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber, l_partkey, l_suppkey) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem),
        |b AS (SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bin, v, bad FROM rk),
        |agg AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |    min(v) AS lo, max(v) AS hi
        |  FROM b GROUP BY bin),
        |tot AS (SELECT CAST(sum(n_bad) AS BIGINT) AS tb,
        |    CAST(sum(n_rows - n_bad) AS BIGINT) AS tg FROM agg),
        |sc AS (SELECT bin, n_rows, n_bad, n_rows - n_bad AS n_good, lo, hi,
        |    (CAST(n_rows - n_bad AS DOUBLE) + 0.5) / CAST(tg AS DOUBLE) AS pg,
        |    (CAST(n_bad AS DOUBLE) + 0.5) / CAST(tb AS DOUBLE) AS pb
        |  FROM agg CROSS JOIN tot)
        |SELECT bin, n_rows, n_bad, n_good, lo, hi,
        |  round(ln(pg / pb), 6) AS woe,
        |  round((pg - pb) * round(ln(pg / pb), 6), 6) AS iv
        |FROM sc ORDER BY bin""".stripMargin,

    "q152_assortativity" ->
      // Pearson over end-point degrees from four exact integer moments
      // (x/y marginals coincide with both orientations present)
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |sup AS (SELECT a.pk AS pa, b.pk AS pb
        |        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |        GROUP BY a.pk, b.pk),
        |e AS (SELECT CAST(pa AS BIGINT) AS u, CAST(pb AS BIGINT) AS v FROM sup
        |      UNION SELECT CAST(pb AS BIGINT), CAST(pa AS BIGINT) FROM sup),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
        |p AS (SELECT da.d AS du, db.d AS dv FROM e
        |      JOIN deg da ON da.u = e.u JOIN deg db ON db.u = e.v),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m2,
        |    CAST(sum(du) AS BIGINT) AS sx,
        |    CAST(sum(du * dv) AS BIGINT) AS sxy,
        |    CAST(sum(du * du) AS BIGINT) AS sxx FROM p),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT n_nodes, m2 // 2 AS n_edges,
        |  CASE WHEN m2 * sxx - sx * sx = 0 THEN NULL
        |    ELSE round(CAST(m2 * sxy - sx * sx AS DOUBLE)
        |      / CAST(m2 * sxx - sx * sx AS DOUBLE), 6) END AS assortativity
        |FROM m CROSS JOIN n""".stripMargin,

    "q153_mann_whitney" ->
      // midranks over the distinct-value frame, kept exact as x2
      // integers; the one-row normal approximation mirrors the Spark
      // float-op order term for term
      """WITH ev AS (SELECT value AS v, event_type = 'purchase' AS a
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |    AND value IS NOT NULL),
        |pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ta
        |  FROM ev GROUP BY v),
        |rk AS (SELECT v, t, ta,
        |    CAST(coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below FROM pv),
        |m AS (SELECT CAST(sum(ta) AS BIGINT) AS n_a,
        |    CAST(sum(t - ta) AS BIGINT) AS n_b,
        |    CAST(sum(ta * (2 * below + t + 1)) AS BIGINT) AS r_a_x2,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM rk)
        |SELECT n_a, n_b, r_a_x2 - n_a * (n_a + 1) AS u_a_x2,
        |  round(CAST(r_a_x2 - n_a * (n_a + 1) - n_a * n_b AS DOUBLE)
        |    / (CAST(2 AS DOUBLE) * sqrt(
        |        CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12 AS DOUBLE)
        |          * (CAST(n_a + n_b + 1 AS DOUBLE)
        |            - CAST(tie3 AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE)
        |              * CAST(n_a + n_b - 1 AS DOUBLE))))), 6) AS z
        |FROM m""".stripMargin,

    "q154_dhash_hamming" ->
      // hash bits replayed from the cell formula WITH the single-cell
      // bump; brute-force Hamming join — by pigeonhole the 4-band
      // multi-index candidate set is lossless at distance <= 3
      """WITH keys AS (SELECT CAST(p_partkey AS BIGINT) AS k,
        |    CAST(p_partkey - p_partkey % 10 AS BIGINT) AS kb
        |  FROM part WHERE p_partkey % 5 = 2),
        |cells AS (SELECT k, kb, gx, gy, k % 10 = 7 AS mut
        |  FROM keys CROSS JOIN range(9) t1(gx) CROSS JOIN range(8) t2(gy)),
        |vals AS (SELECT k, gx, gy,
        |    (kb*31 + gx*17 + gy*29 + gx*gy*7
        |     + (kb % 251)*gx*13 + (kb % 241)*gy*11
        |     + CASE WHEN mut AND gx = (kb // 10) % 9 AND gy = (kb // 10) % 8
        |            THEN 120 ELSE 0 END) % 255 AS v
        |  FROM cells),
        |bits AS (SELECT a.k, a.gy*8 + a.gx AS i,
        |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM vals a JOIN vals b
        |    ON b.k = a.k AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |h AS (SELECT k,
        |    CAST(SUM(CASE WHEN i >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT)
        |      AS hi,
        |    CAST(SUM(CASE WHEN i < 32
        |      THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY k)
        |SELECT a.k AS id_a, b.k AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |    AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.k < b.k
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q155_sorted_neighborhood" ->
      // rank-window candidates + bounded-Levenshtein verify; the rank
      // line replay is a plain row_number under the same total order
      """WITH rk AS (SELECT c_custkey AS id, c_name AS nm,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT)
        |      AS rn
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b, b.rn - a.rn AS gap,
        |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |FROM rk a JOIN rk b ON b.rn - a.rn BETWEEN 1 AND 3
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q156_cms_sketch" ->
      // integer end to end: the depth row-hashes are disjoint 8-hex
      // (32-bit) slices of ONE md5 per value; point query = min over
      // depth rows; probes = top-25 exact frequencies
      s"""WITH toks AS (SELECT unnest($SqlToks) AS tok FROM documents),
         |exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
         |          FROM toks GROUP BY tok),
         |probes AS (SELECT tok, exact_cnt FROM exact
         |           ORDER BY exact_cnt DESC, tok LIMIT 25),
         |cells AS (SELECT j AS row_idx,
         |    CAST(('0x' || substr(md5(tok), 1 + 8 * CAST(j AS INT), 8))
         |      AS BIGINT) % 256 AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks CROSS JOIN range(4) t(j) GROUP BY 1, 2),
         |pq AS (SELECT p.tok, p.exact_cnt,
         |    CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
         |  FROM probes p CROSS JOIN range(4) t(j)
         |  LEFT JOIN cells c ON c.row_idx = t.j AND c.bucket =
         |    CAST(('0x' || substr(md5(p.tok), 1 + 8 * CAST(t.j AS INT), 8))
         |      AS BIGINT) % 256
         |  GROUP BY p.tok, p.exact_cnt)
         |SELECT tok, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
         |FROM pq ORDER BY tok""".stripMargin,

    "q157_user_trend" ->
      // five exact DECIMAL moments per user; closed-form ratios with
      // one double division each, rounded 6dp
      """WITH ev AS (SELECT user_id,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
        |    CAST(value AS DECIMAL(9,2)) AS y FROM events),
        |o AS (SELECT user_id,
        |    (us - min(us) OVER (PARTITION BY user_id)) // 1000000 AS x, y
        |  FROM ev),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS DECIMAL(19,2)) AS sy,
        |    CAST(sum(y * CAST(x AS DECIMAL(12,0))) AS DECIMAL(31,2)) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM o GROUP BY user_id),
        |f AS (SELECT user_id, n, sx, sy, sxy, sxx,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS den FROM m
        |  WHERE n >= 2)
        |SELECT user_id, n,
        |  round(CAST(CAST(n AS DECIMAL(4,0)) * sxy
        |      - CAST(sx AS DECIMAL(16,0)) * sy AS DOUBLE)
        |    / den, 6) + 0.0 AS slope,
        |  round(CAST(CAST(sy AS DECIMAL(10,2)) * sxx
        |      - CAST(sx AS DECIMAL(16,0)) * CAST(sxy AS DECIMAL(19,2))
        |      AS DOUBLE) / den, 6) + 0.0 AS intercept
        |FROM f WHERE den <> 0 ORDER BY user_id""".stripMargin,

    "q158_trimmed_mean" ->
      // rank cutoffs are exact ppm integer arithmetic; core sum in
      // DECIMAL; one float division per group
      """WITH rk AS (SELECT l_returnflag AS g, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber,
        |        l_partkey, l_suppkey) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT g, v, rn, n, n * 50000 // 1000000 AS cut FROM rk),
        |f AS (SELECT * FROM c WHERE rn > cut AND rn <= n - cut)
        |SELECT g AS l_returnflag, CAST(min(n) AS BIGINT) AS n_values,
        |  CAST(min(cut) AS BIGINT) AS n_trimmed_each,
        |  round(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS trimmed_mean
        |FROM f GROUP BY g ORDER BY l_returnflag""".stripMargin,

    "q159_benford" ->
      // 6-dp DECIMAL chi-square terms -> order-independent sum; digit
      // from the exact integer part's first character
      """WITH b AS (SELECT o_orderstatus AS g,
        |    CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |      1, 1) AS INT) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |obs AS (SELECT g, digit, CAST(count(*) AS BIGINT) AS n_obs
        |        FROM b GROUP BY g, digit),
        |dense AS (SELECT gg.g, d.digit,
        |    CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs
        |  FROM (SELECT DISTINCT g FROM obs) gg
        |  CROSS JOIN range(1, 10) d(digit)
        |  LEFT JOIN obs ON obs.g = gg.g AND obs.digit = d.digit),
        |p AS (SELECT g, CAST(digit AS INT) AS digit, n_obs,
        |    log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS pp FROM dense),
        |s AS (SELECT g, CAST(sum(n_obs) AS BIGINT) AS n FROM p GROUP BY g),
        |t AS (SELECT p.g, p.digit, p.n_obs,
        |    CAST(round(pp * 1e6) AS BIGINT) AS expected_ppm,
        |    CAST(round((CAST(p.n_obs AS DOUBLE) - CAST(s.n AS DOUBLE) * pp)
        |        * (CAST(p.n_obs AS DOUBLE) - CAST(s.n AS DOUBLE) * pp)
        |        / (CAST(s.n AS DOUBLE) * pp), 6) AS DECIMAL(18,6)) AS term
        |  FROM p JOIN s ON s.g = p.g),
        |c AS (SELECT g, CAST(sum(term) AS DOUBLE) + 0.0 AS chi2
        |      FROM t GROUP BY g)
        |SELECT t.g AS o_orderstatus, t.digit, t.n_obs, t.expected_ppm, c.chi2
        |FROM t JOIN c ON c.g = t.g ORDER BY o_orderstatus, digit""".stripMargin,

    "q160_jaro_winkler" ->
      // DuckDB's jaro_winkler_similarity IS the oracle for the native
      // expression; both sides threshold the ROUNDED score
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE round(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.985
        |ORDER BY id_a, id_b""".stripMargin,

    "q161_personalized_pr" ->
      // q83's unroll with a seed-restart vector; float noise absorbed
      // by round(pr,6) exactly as there
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
        |sd AS (SELECT node FROM nodes WHERE node % 300 = 0),
        |sk AS (SELECT count(*) AS k FROM sd),
        |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |rv AS (SELECT nodes.node,
        |    CASE WHEN sd.node IS NULL THEN CAST(0 AS DOUBLE)
        |         ELSE CAST(1 AS DOUBLE) / sk.k END AS rm
        |  FROM nodes CROSS JOIN sk LEFT JOIN sd ON sd.node = nodes.node),
        |r0 AS (SELECT node, rm AS pr FROM rv),
        |c1 AS (SELECT e.dst AS node, sum(r0.pr / od.outdeg) AS s
        |  FROM e JOIN r0 ON r0.node = e.src JOIN od ON od.src = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT rv.node,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * rv.rm
        |   + CAST(0.85 AS DOUBLE) * coalesce(c1.s, CAST(0 AS DOUBLE)) AS pr
        | FROM rv LEFT JOIN c1 ON c1.node = rv.node),
        |c2 AS (SELECT e.dst AS node, sum(r1.pr / od.outdeg) AS s
        |  FROM e JOIN r1 ON r1.node = e.src JOIN od ON od.src = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT rv.node,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * rv.rm
        |   + CAST(0.85 AS DOUBLE) * coalesce(c2.s, CAST(0 AS DOUBLE)) AS pr
        | FROM rv LEFT JOIN c2 ON c2.node = rv.node),
        |c3 AS (SELECT e.dst AS node, sum(r2.pr / od.outdeg) AS s
        |  FROM e JOIN r2 ON r2.node = e.src JOIN od ON od.src = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT rv.node,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * rv.rm
        |   + CAST(0.85 AS DOUBLE) * coalesce(c3.s, CAST(0 AS DOUBLE)) AS pr
        | FROM rv LEFT JOIN c3 ON c3.node = rv.node)
        |SELECT node AS part, round(pr, 6) AS pr FROM r3
        |WHERE round(pr, 6) > 0
        |ORDER BY round(pr, 6) DESC, node LIMIT 20""".stripMargin,

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

    "q163_ks_test" ->
      // exact integer ECDF numerators; one float ratio at the end;
      // argmax tie-broken to the smallest value
      """WITH ev AS (SELECT value AS v, event_type = 'purchase' AS a
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |    AND value IS NOT NULL),
        |pv AS (SELECT v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM ev GROUP BY v),
        |cum AS (SELECT v,
        |    CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cumb
        |  FROM pv),
        |tot AS (SELECT max(cuma) AS n_a, max(cumb) AS n_b FROM cum),
        |d AS (SELECT cum.v, tot.n_a, tot.n_b,
        |    abs(cuma * tot.n_b - cumb * tot.n_a) AS dnum
        |  FROM cum CROSS JOIN tot)
        |SELECT n_a, n_b, dnum AS d_num,
        |  round(CAST(dnum AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks_d,
        |  v AS at_value
        |FROM d ORDER BY dnum DESC, v ASC LIMIT 1""".stripMargin,

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

    "q165_containment" ->
      // distinct-shingle intersection restricted to the mutant→origin
      // pair list; exact integer ppm ratios
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |pr AS (SELECT doc_id + 2000000 AS id1, doc_id AS id2
         |       FROM documents WHERE doc_id % 7 = 0),
         |ids AS (SELECT id1 AS id FROM pr UNION SELECT id2 FROM pr),
         |shp AS (SELECT s.doc_id AS id, s.sh FROM s JOIN ids
         |        ON ids.id = s.doc_id),
         |sz AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM shp GROUP BY id),
         |iv AS (SELECT pr.id1, pr.id2, CAST(count(*) AS BIGINT) AS n_common
         |  FROM pr JOIN shp a ON a.id = pr.id1
         |          JOIN shp b ON b.id = pr.id2 AND b.sh = a.sh
         |  GROUP BY pr.id1, pr.id2)
         |SELECT pr.id1, pr.id2, s1.n AS n1, s2.n AS n2,
         |  CAST(coalesce(iv.n_common, 0) AS BIGINT) AS n_common,
         |  coalesce(iv.n_common, 0) * 1000000 // s1.n AS c12_ppm,
         |  coalesce(iv.n_common, 0) * 1000000 // s2.n AS c21_ppm
         |FROM pr LEFT JOIN iv ON iv.id1 = pr.id1 AND iv.id2 = pr.id2
         |JOIN sz s1 ON s1.id = pr.id1 JOIN sz s2 ON s2.id = pr.id2
         |ORDER BY pr.id1""".stripMargin,

    "q166_hist_quantiles" ->
      // integer end to end: exact cents, ceil-rank targets in ppm,
      // cumulative bin walk, integer within-bin interpolation
      """WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS cents FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |h AS (SELECT cents // 100000 AS bin, CAST(count(*) AS BIGINT) AS cnt
        |      FROM c GROUP BY 1),
        |cum AS (SELECT bin, cnt,
        |    CAST(sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY bin ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
        |  FROM h),
        |tot AS (SELECT max(cum) AS n_values FROM cum),
        |t AS (SELECT CAST(q AS BIGINT) AS q_ppm, tot.n_values,
        |    (tot.n_values * q + 999999) // 1000000 AS target_rank
        |  FROM tot CROSS JOIN (VALUES (500000), (900000), (990000)) v(q))
        |SELECT t.q_ppm, t.n_values, CAST(t.target_rank AS BIGINT)
        |    AS target_rank, cum.bin,
        |  CAST(cum.bin * 100000
        |    + ((t.target_rank - cum.prev) * 100000) // cum.cnt AS BIGINT)
        |    AS est
        |FROM t JOIN cum ON cum.cum >= t.target_rank
        |  AND cum.prev < t.target_rank
        |ORDER BY q_ppm""".stripMargin,

    "q167_dup_source_matrix" ->
      // the q24 PPJoin pair replay rolled up by orientation-normalized
      // source pair (synthetic ids map to their base doc's source)
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
         | GROUP BY 1, 2),
         |jac AS (SELECT com.id1, com.id2,
         |  CAST(com.common AS DOUBLE) / CAST(n1.n + n2.n - com.common
         |    AS DOUBLE) AS jaccard
         | FROM com JOIN n n1 ON n1.doc_id = com.id1
         |          JOIN n n2 ON n2.doc_id = com.id2),
         |pairs AS (SELECT id1, id2 FROM jac WHERE jaccard >= 0.6),
         |m AS (SELECT least(da.source, db.source) AS source_a,
         |    greatest(da.source, db.source) AS source_b
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.id1 % 1000000
         |  JOIN documents db ON db.doc_id = p.id2 % 1000000)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM m GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,

    "q168_quantile_normalize" ->
      // pure integer rank mapping: r -> ref value at ceil(r*n_ref/n)
      """WITH a AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    l_extendedprice,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber, l_partkey, l_suppkey) AS ra
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |b AS (SELECT l_extendedprice AS vref,
        |    row_number() OVER (ORDER BY l_extendedprice) AS rb
        |  FROM lineitem WHERE l_returnflag = 'N'),
        |na AS (SELECT count(*) AS n FROM a),
        |nb AS (SELECT count(*) AS n FROM b)
        |SELECT a.l_orderkey, a.l_linenumber, a.l_partkey, a.l_suppkey,
        |  a.l_extendedprice, b.vref AS v_norm
        |FROM a CROSS JOIN na CROSS JOIN nb
        |JOIN b ON b.rb = (a.ra * nb.n + na.n - 1) // na.n
        |ORDER BY a.l_orderkey, a.l_linenumber, a.l_partkey,
        |  a.l_suppkey""".stripMargin,

    "q169_attribution" ->
      // as-of attribution replayed as the union-window last_value;
      // revenue sums in DECIMAL, one double cast at the end
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
        |    CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |u AS (SELECT user_id, us, 1 AS side, v,
        |    CAST(NULL AS VARCHAR) AS tt FROM ev WHERE event_type = 'purchase'
        |  UNION ALL SELECT user_id, us, 0, CAST(NULL AS DECIMAL(18,2)),
        |    event_type FROM ev WHERE event_type IN ('click', 'view')),
        |w AS (SELECT user_id, us, side, v,
        |    last_value(tt IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY us, side ROWS UNBOUNDED PRECEDING) AS tt
        |  FROM u)
        |SELECT coalesce(tt, 'direct') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(v) AS DOUBLE) AS revenue
        |FROM w WHERE side = 1 GROUP BY 1 ORDER BY channel""".stripMargin,

    "q170_zipf_fit" ->
      // 6dp-rounded lns in DECIMAL (order-independent sums), OLS
      // closed form with the same cast ladder as the Spark side
      s"""WITH tok AS (SELECT lang, unnest($SqlToks) AS tok FROM documents),
         |cnt AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS freq
         |        FROM tok GROUP BY lang, tok),
         |rk AS (SELECT lang, freq, row_number() OVER (PARTITION BY lang
         |      ORDER BY freq DESC, tok) AS rk FROM cnt),
         |t AS (SELECT lang,
         |    CAST(round(ln(CAST(rk AS DOUBLE)), 6) AS DECIMAL(8,6)) AS x,
         |    CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(8,6)) AS y
         |  FROM rk WHERE rk <= 100),
         |m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(x) AS DECIMAL(12,6)) AS sx,
         |    CAST(sum(y) AS DECIMAL(12,6)) AS sy,
         |    CAST(sum(x * y) AS DECIMAL(20,12)) AS sxy,
         |    CAST(sum(x * x) AS DECIMAL(20,12)) AS sxx
         |  FROM t GROUP BY lang)
         |SELECT lang, n_terms,
         |  round(CAST(CAST(n_terms AS DECIMAL(3,0)) * sxy - sx * sy
         |      AS DOUBLE)
         |    / CAST(CAST(n_terms AS DECIMAL(3,0)) * sxx - sx * sx
         |      AS DOUBLE), 6) + 0.0 AS zipf_slope
         |FROM m ORDER BY lang""".stripMargin,

    "q171_power_law" ->
      // Newman MLE over the degree tail; 6dp DECIMAL ln sums
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |sup AS (SELECT a.pk AS pa, b.pk AS pb
        |        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |        GROUP BY a.pk, b.pk),
        |e AS (SELECT CAST(pa AS BIGINT) AS u, CAST(pb AS BIGINT) AS v
        |      FROM sup
        |      UNION SELECT CAST(pb AS BIGINT), CAST(pa AS BIGINT) FROM sup),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
        |tail AS (SELECT d FROM deg WHERE d >= 10)
        |SELECT CAST(count(*) AS BIGINT) AS n_tail, CAST(10 AS BIGINT) AS dmin,
        |  round(CAST(1 AS DOUBLE) + CAST(count(*) AS DOUBLE)
        |    / CAST(sum(CAST(round(ln(CAST(d AS DOUBLE)
        |        / CAST(9.5 AS DOUBLE)), 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS alpha
        |FROM tail""".stripMargin,

    "q172_jdbc_roundtrip" ->
      // replay the sink merge relationally: base insert (keys <= 50),
      // then a keyed upsert of the delta (26..60, bal doubled — exact
      // in IEEE) — delta wins on overlap, new delta keys insert
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal
        |  FROM customer WHERE c_custkey <= 50),
        |delta AS (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal * 2 AS bal
        |  FROM customer WHERE c_custkey BETWEEN 26 AND 60)
        |SELECT coalesce(d.id, b.id) AS id,
        |  coalesce(d.name, b.name) AS name,
        |  coalesce(d.bal, b.bal) AS bal
        |FROM base b FULL JOIN delta d ON b.id = d.id
        |ORDER BY 1""".stripMargin,

    "q173_adamic_adar" ->
      // wedge join through the shared neighbor over the >=2-support
      // co-purchase graph; 1/ln(deg) weights rounded 6dp, summed in
      // DECIMAL; existing edges anti-joined away; hub cap replayed
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sup AS (SELECT a.pk AS pa, b.pk AS pb FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT CAST(pa AS BIGINT) AS lo, CAST(pb AS BIGINT) AS hi FROM sup),
        |m AS (SELECT lo AS u, hi AS v FROM e UNION ALL SELECT hi, lo FROM e),
        |deg AS (SELECT u AS w, count(*) AS deg FROM m GROUP BY u),
        |centers AS (SELECT w,
        |  CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 6) AS DECIMAL(8,6)) AS aa_w
        | FROM deg WHERE deg <= 10000),
        |adj AS MATERIALIZED (SELECT m.v AS w, m.u AS n, c.aa_w
        |  FROM m JOIN centers c ON c.w = m.v),
        |wedges AS (SELECT a.n AS u, b.n AS v, a.aa_w
        |  FROM adj a JOIN adj b ON a.w = b.w AND a.n < b.n),
        |scored AS (SELECT u, v, count(*) AS n_common,
        |  CAST(sum(aa_w) AS DECIMAL(18,6)) AS aa_score
        | FROM wedges GROUP BY u, v),
        |nonedge AS (SELECT s.* FROM scored s
        |  LEFT JOIN e ON e.lo = s.u AND e.hi = s.v WHERE e.lo IS NULL)
        |SELECT u, v, n_common, CAST(aa_score AS DOUBLE) AS aa_score
        |FROM nonedge ORDER BY aa_score DESC, u, v LIMIT 50""".stripMargin,

    "q174_item_cosine" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pc AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_both FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
        |ic AS (SELECT pk AS item, count(*) AS n FROM li GROUP BY pk),
        |p AS (SELECT * FROM pc WHERE n_both >= 2),
        |bo AS (SELECT pa AS item, pb AS other, n_both FROM p
        |  UNION ALL SELECT pb, pa, n_both FROM p),
        |scored AS (SELECT b.item, b.other, b.n_both,
        |  round(CAST(b.n_both AS DOUBLE) / sqrt(CAST(na.n * nb.n AS DOUBLE)), 6) AS cos
        | FROM bo b JOIN ic na ON na.item = b.item JOIN ic nb ON nb.item = b.other),
        |rk AS (SELECT *, row_number() OVER
        |  (PARTITION BY item ORDER BY cos DESC, other) AS rk FROM scored)
        |SELECT item, other, n_both, cos, CAST(rk AS INT) AS rk
        |FROM rk WHERE rk <= 3 ORDER BY item, rk""".stripMargin,

    "q175_hits" ->
      // two unrolled HITS rounds; every normalized score is
      // round(raw/sum, 6) in DECIMAL so the replay is exact
      """WITH e AS MATERIALIZED (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
        |  CAST(l_partkey AS BIGINT) AS p
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |h0 AS (SELECT u, CAST(1 AS DECIMAL(18,6)) AS h
        |  FROM (SELECT DISTINCT u FROM e)),
        |a1r AS (SELECT p, CAST(sum(h) AS DECIMAL(28,6)) AS raw
        |  FROM e JOIN h0 USING (u) GROUP BY p),
        |a1 AS (SELECT p, CAST(round(CAST(raw AS DOUBLE) /
        |  (SELECT CAST(sum(raw) AS DOUBLE) FROM a1r), 6) AS DECIMAL(10,6)) AS a
        | FROM a1r),
        |h1r AS (SELECT u, CAST(sum(a) AS DECIMAL(28,6)) AS raw
        |  FROM e JOIN a1 USING (p) GROUP BY u),
        |h1 AS (SELECT u, CAST(round(CAST(raw AS DOUBLE) /
        |  (SELECT CAST(sum(raw) AS DOUBLE) FROM h1r), 6) AS DECIMAL(10,6)) AS h
        | FROM h1r),
        |a2r AS (SELECT p, CAST(sum(h) AS DECIMAL(28,6)) AS raw
        |  FROM e JOIN h1 USING (u) GROUP BY p),
        |a2 AS (SELECT p, CAST(round(CAST(raw AS DOUBLE) /
        |  (SELECT CAST(sum(raw) AS DOUBLE) FROM a2r), 6) AS DECIMAL(10,6)) AS a
        | FROM a2r)
        |SELECT p AS item, CAST(a AS DOUBLE) AS auth
        |FROM a2 ORDER BY auth DESC, item LIMIT 20""".stripMargin,

    "q176_chi_square" ->
      // full |A|x|B| grid including zero cells; per-cell term
      // (o*n - r*c)^2 / (n*r*c) with exact integer operands, rounded
      // 6dp, summed in DECIMAL
      """WITH cells AS (SELECT lang AS a, source AS b, count(*) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |  count(DISTINCT a) AS n_a, count(DISTINCT b) AS n_b FROM cells),
        |grid AS (SELECT rt.a, ct.b, rt.r, ct.c, coalesce(cells.o, 0) AS o
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
        |terms AS (SELECT t.n, t.n_a, t.n_b,
        |  CAST(round(CAST(CAST(g.o * t.n - g.r * g.c AS DECIMAL(19,0)) *
        |      CAST(g.o * t.n - g.r * g.c AS DECIMAL(19,0)) AS DOUBLE) /
        |    CAST(t.n * g.r * g.c AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
        | FROM grid g CROSS JOIN tot t),
        |agg AS (SELECT n, n_a, n_b, CAST(sum(term) AS DECIMAL(28,6)) AS chi2d
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT n, n_a, n_b, CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
        |  CAST(chi2d AS DOUBLE) AS chi2,
        |  CASE WHEN least(n_a, n_b) <= 1 THEN NULL
        |    ELSE round(sqrt(CAST(chi2d AS DOUBLE) /
        |      CAST(n * (least(n_a, n_b) - 1) AS DOUBLE)), 6) END AS cramers_v
        |FROM agg""".stripMargin,

    "q177_spearman" ->
      // midranks (x2, exact integers) from the distinct-value frames;
      // Pearson over ranks with DECIMAL(19,0)x(19,0) cross-products
      """WITH base AS (SELECT event_type AS g, value AS x,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y
        | FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |xv AS (SELECT g, x, count(*) AS t FROM base GROUP BY 1, 2),
        |xr AS (SELECT g, x, 2 * coalesce(sum(t) OVER
        |  (PARTITION BY g ORDER BY x
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
        |  AS mx2 FROM xv),
        |yv AS (SELECT g, y, count(*) AS t FROM base GROUP BY 1, 2),
        |yr AS (SELECT g, y, 2 * coalesce(sum(t) OVER
        |  (PARTITION BY g ORDER BY y
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
        |  AS my2 FROM yv),
        |rk AS (SELECT b.g, xr.mx2, yr.my2 FROM base b
        |  JOIN xr ON xr.g = b.g AND xr.x = b.x
        |  JOIN yr ON yr.g = b.g AND yr.y = b.y),
        |m AS (SELECT g, count(*) AS n, sum(mx2) AS sx, sum(my2) AS sy,
        |  sum(mx2 * my2) AS sxy, sum(mx2 * mx2) AS sxx,
        |  sum(my2 * my2) AS syy FROM rk GROUP BY g),
        |f AS (SELECT g, n,
        |  CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,0)) -
        |    CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS num,
        |  CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0)) -
        |    CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS vx,
        |  CAST(n AS DECIMAL(19,0)) * CAST(syy AS DECIMAL(19,0)) -
        |    CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS vy
        | FROM m)
        |SELECT g AS event_type, n,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |    ELSE round(CAST(num AS DOUBLE) /
        |      sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6) END AS rho
        |FROM f ORDER BY event_type""".stripMargin,

    "q178_ewma" -> ewmaSql(8),

    "q179_textrank" -> textRankSql(2),

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

    "q181_sssp" -> ssspSql(4),

    "q182_kappa" ->
      // replay the lang-ID argmax (q20's fragment), then kappa in its
      // cleared-denominator integer form; one float divide per stat
      s"""WITH t AS (SELECT lang, $SqlToks AS toks FROM documents),
         |sc AS (SELECT lang,
         | len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
         | len(list_filter(toks, x -> x IN ('the','a','is','of','and','to','in','it'))) AS s_en,
         | len(list_filter(toks, x -> x IN ('el','la','y','es','de','que','un','en'))) AS s_es,
         | len(list_filter(toks, x -> x IN ('le','la','et','est','les','des','un','une'))) AS s_fr
         | FROM t),
         |lab AS (SELECT lang AS b,
         | CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |      WHEN s_es >= s_de AND s_es >= s_en AND s_es >= s_fr THEN 'es'
         |      WHEN s_fr >= s_de AND s_fr >= s_en AND s_fr >= s_es THEN 'fr'
         |      ELSE 'und' END AS a
         | FROM sc WHERE lang IS NOT NULL),
         |cells AS (SELECT a, b, count(*) AS o FROM lab GROUP BY 1, 2),
         |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
         |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
         |pe AS (SELECT CAST(coalesce(sum(CAST(r * c AS DECIMAL(19,0))), 0)
         |    AS DECIMAL(19,0)) AS rc
         |  FROM rt JOIN ct ON rt.a = ct.b),
         |ag AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS d
         |  FROM cells WHERE a = b),
         |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
         |SELECT n, d AS n_agree,
         | round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
         | round(CAST(rc AS DOUBLE) / CAST(n * n AS DOUBLE), 6) AS pe,
         | CASE WHEN CAST(n * n AS DECIMAL(19,0)) = rc THEN NULL
         |   ELSE round(CAST(CAST(n AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))
         |       - rc AS DOUBLE) /
         |     CAST(CAST(n * n AS DECIMAL(19,0)) - rc AS DOUBLE), 6) END AS kappa
         |FROM tot CROSS JOIN ag CROSS JOIN pe""".stripMargin,

    "q183_moments" ->
      // exact integer power sums S1..S4 (DECIMAL sized under both
      // engines' 38-digit multiply cap), closed forms in DOUBLE with
      // the identical expression tree; m2*sqrt(m2) instead of
      // pow(m2,1.5) (sqrt is correctly-rounded, pow is libm-dependent)
      """WITH ev AS (SELECT event_type AS g,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |cc AS (SELECT g, c, CAST(CAST(c AS DECIMAL(10,0)) *
        |    CAST(c AS DECIMAL(10,0)) AS DECIMAL(19,0)) AS c2
        |  FROM ev),
        |s AS (SELECT g, count(*) AS n,
        |  CAST(sum(CAST(c AS DECIMAL(10,0))) AS DECIMAL(16,0)) AS s1,
        |  CAST(sum(c2) AS DECIMAL(22,0)) AS s2,
        |  CAST(sum(CAST(c2 * CAST(c AS DECIMAL(10,0)) AS DECIMAL(29,0)))
        |    AS DECIMAL(28,0)) AS s3,
        |  CAST(sum(c2 * c2) AS DECIMAL(34,0)) AS s4
        | FROM cc GROUP BY g),
        |m AS (SELECT g, n, s1, s2, s3, s4,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu FROM s),
        |mm AS (SELECT g, n, mu,
        |  CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mu * mu AS m2,
        |  CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) -
        |    CAST(3 AS DOUBLE) * mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) +
        |    CAST(2 AS DOUBLE) * mu * mu * mu AS m3,
        |  CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) -
        |    CAST(4 AS DOUBLE) * mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) +
        |    CAST(6 AS DOUBLE) * mu * mu *
        |      (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) -
        |    CAST(3 AS DOUBLE) * mu * mu * mu * mu AS m4
        | FROM m)
        |SELECT g AS event_type, n, round(mu, 6) AS mean, round(m2, 6) AS m2,
        | CASE WHEN m2 <= CAST(0 AS DOUBLE) THEN NULL
        |   ELSE round(m3 / (m2 * sqrt(m2)), 6) + CAST(0 AS DOUBLE)
        |   END AS skewness,
        | CASE WHEN m2 <= CAST(0 AS DOUBLE) THEN NULL
        |   ELSE round(m4 / (m2 * m2) - CAST(3 AS DOUBLE), 6) + CAST(0 AS DOUBLE)
        |   END AS kurtosis_excess
        |FROM mm ORDER BY event_type""".stripMargin,

    "q184_diversity" ->
      """WITH cells AS (SELECT source, lang, count(*) AS nl
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(nl) AS BIGINT) AS n,
        |  count(*) AS k, CAST(sum(nl * nl) AS BIGINT) AS sl2
        | FROM cells GROUP BY source),
        |terms AS (SELECT c.source, t.n AS n_docs, t.k AS n_langs, t.sl2,
        |  CAST(round(-(CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |    AS DECIMAL(10,6)) AS term
        | FROM cells c JOIN tot t ON t.source = c.source)
        |SELECT source, n_docs, n_langs,
        | CAST(CAST(sum(term) AS DECIMAL(18,6)) AS DOUBLE) AS shannon,
        | 1000000 - (sl2 * 1000000) // (n_docs * n_docs) AS simpson_ppm
        |FROM terms GROUP BY source, n_docs, n_langs, sl2
        |ORDER BY source""".stripMargin,

    "q185_partition_balance" ->
      """WITH b AS (SELECT
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 32 AS bucket, count(*) AS n_rows
        | FROM documents GROUP BY 1)
        |SELECT CAST(sum(n_rows) AS BIGINT) AS n,
        | count(*) AS n_buckets,
        | CAST(min(n_rows) AS BIGINT) AS min_rows,
        | CAST(max(n_rows) AS BIGINT) AS max_rows,
        | CAST(max(n_rows) * count(*) * 1000000 AS BIGINT)
        |   // CAST(sum(n_rows) AS BIGINT) AS max_over_avg_ppm
        |FROM b""".stripMargin,

    "q186_silhouette" ->
      // centroid-based silhouette: 6dp-quantized components, DECIMAL
      // centroids and squared distances; sqrt/ratio float, 6dp
      """WITH ex AS (SELECT vec_id AS vid, label AS own,
        |  generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
        |  CAST(unnest(CAST(embedding AS DOUBLE[])) AS DECIMAL(12,6)) AS xd
        | FROM embeddings),
        |cent AS (SELECT own AS clabel, dim, count(*) AS nc,
        |  CAST(sum(xd) AS DECIMAL(30,6)) AS sx
        | FROM ex GROUP BY 1, 2),
        |c2 AS (SELECT clabel, dim,
        |  CAST(round(CAST(sx AS DOUBLE) / CAST(nc AS DOUBLE), 6)
        |    AS DECIMAL(12,6)) AS c
        | FROM cent),
        |dd AS (SELECT e.vid, e.own, c2.clabel,
        |  CAST(sum(CAST((e.xd - c2.c) * (e.xd - c2.c) AS DECIMAL(27,12)))
        |    AS DECIMAL(32,12)) AS d2
        | FROM ex e JOIN c2 ON c2.dim = e.dim GROUP BY 1, 2, 3),
        |ab AS (SELECT vid, own,
        |  max(CASE WHEN clabel = own THEN d2 END) AS a2,
        |  min(CASE WHEN clabel <> own THEN d2 END) AS b2
        | FROM dd GROUP BY 1, 2),
        |sil AS (SELECT vid, own,
        |  CASE WHEN b2 IS NULL THEN NULL
        |    WHEN greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE)))
        |      = CAST(0 AS DOUBLE) THEN CAST(0 AS DECIMAL(10,6))
        |    ELSE CAST(round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
        |      / greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE))), 6)
        |      AS DECIMAL(10,6)) END AS s
        | FROM ab)
        |SELECT own AS label, count(s) AS n_vecs,
        | round(CAST(CAST(sum(s) AS DECIMAL(18,6)) AS DOUBLE)
        |   / CAST(count(s) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
        |   AS mean_silhouette
        |FROM sil GROUP BY own ORDER BY label""".stripMargin,

    "q187_jl_recall" ->
      // signed JL projection (md5-parity signs over 1-based dims),
      // top-10 by projected cosine vs the exact top-10, recall in ppm
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id >= 10),
         |ex AS (SELECT vec_id AS id,
         |  generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS indim,
         |  CAST(unnest(CAST(embedding AS DOUBLE[])) AS DECIMAL(12,6)) AS xd
         | FROM embeddings),
         |pd AS (SELECT unnest(generate_series(1, 16)) AS pdim),
         |sg AS (SELECT id, pdim,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(pdim AS VARCHAR) || ':' ||
         |      CAST(indim AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0
         |    THEN xd ELSE -xd END AS t
         | FROM ex CROSS JOIN pd),
         |pr AS MATERIALIZED (SELECT id, pdim, CAST(sum(t) AS DECIMAL(14,6)) AS p
         |  FROM sg GROUP BY 1, 2),
         |n2 AS (SELECT id, CAST(sum(CAST(p * p AS DECIMAL(34,12)))
         |    AS DECIMAL(38,12)) AS n2
         |  FROM pr GROUP BY id),
         |dt AS (SELECT a.id AS query_id, b.id AS cand_id,
         |  CAST(sum(CAST(a.p * b.p AS DECIMAL(34,12))) AS DECIMAL(38,12)) AS dot
         | FROM pr a JOIN pr b USING (pdim)
         | WHERE a.id < 10 AND b.id >= 10 GROUP BY 1, 2),
         |cosf AS (SELECT query_id, cand_id,
         |  round(CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
         |    AS cosp
         | FROM dt JOIN n2 na ON na.id = dt.query_id
         | JOIN n2 nb ON nb.id = dt.cand_id
         | WHERE CAST(na.n2 AS DOUBLE) > 0 AND CAST(nb.n2 AS DOUBLE) > 0),
         |ar AS (SELECT query_id, cand_id FROM (SELECT query_id, cand_id,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosp DESC, cand_id) AS rk FROM cosf) WHERE rk <= 10),
         |scored AS (SELECT query_id, vec_id, ${sqlCosine("qv", "cv")} AS sim
         |  FROM q, c),
         |er AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id) AS rk FROM scored) WHERE rk <= 10)
         |SELECT e.query_id, CAST(count(a.cand_id) AS BIGINT) AS n_hit,
         | CAST(count(a.cand_id) * 100000 AS BIGINT) AS recall_ppm
         |FROM er e LEFT JOIN ar a
         |  ON a.query_id = e.query_id AND a.cand_id = e.vec_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "q188_constraint_audit" ->
      """WITH r AS (
        | SELECT 'customer_custkey_not_null' AS constraint_name,
        |  'customer' AS table_name, count(*) AS n_checked,
        |  CAST(coalesce(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_violations FROM customer
        | UNION ALL
        | SELECT 'customer_custkey_unique', 'customer',
        |  CAST(sum(n) AS BIGINT), CAST(sum(n - 1) AS BIGINT)
        | FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey)
        | UNION ALL
        | SELECT 'customer_acctbal_range', 'customer', count(*),
        |  CAST(coalesce(sum(CASE WHEN c_acctbal IS NOT NULL AND
        |    (c_acctbal < -1000.0 OR c_acctbal > 10000.0) THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) FROM customer
        | UNION ALL
        | SELECT 'customer_mktsegment_domain', 'customer', count(*),
        |  CAST(coalesce(sum(CASE WHEN c_mktsegment IS NOT NULL AND
        |    c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE',
        |      'HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END), 0) AS BIGINT)
        | FROM customer
        | UNION ALL
        | SELECT 'orders_custkey_ref_customer', 'orders',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        | UNION ALL
        | SELECT 'lineitem_orderkey_ref_orders', 'lineitem',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        | UNION ALL
        | SELECT 'orders_totalprice_range', 'orders', count(*),
        |  CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL AND
        |    (o_totalprice < 1.0 OR o_totalprice > 1000000.0) THEN 1 ELSE 0
        |    END), 0) AS BIGINT) FROM orders)
        |SELECT constraint_name, table_name, n_checked, n_violations,
        | n_violations = 0 AS passed
        |FROM r ORDER BY constraint_name""".stripMargin,

    "q189_triple_itemsets" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |fp AS (SELECT a.pk AS pa, b.pk AS pb FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |po AS (SELECT a.ok, a.pk AS pa, b.pk AS pb FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  JOIN fp ON fp.pa = a.pk AND fp.pb = b.pk),
        |tr AS (SELECT po.pa, po.pb, c.pk AS pc, count(*) AS support
        |  FROM po JOIN li c ON c.ok = po.ok AND c.pk > po.pb
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
        |SELECT pa, pb, pc, support FROM tr
        |ORDER BY support DESC, pa, pb, pc LIMIT 20""".stripMargin,

    "q190_conversion_delay" ->
      """WITH ev AS (SELECT user_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |sg AS (SELECT user_id, min(us) AS sus FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |fp AS (SELECT p.user_id, sg.sus, min(p.us) AS pus FROM ev p
        |  JOIN sg ON sg.user_id = p.user_id AND p.us >= sg.sus
        |  WHERE p.event_type = 'purchase' GROUP BY 1, 2),
        |dl AS (SELECT ((sus // 86400000000) + 4) % 7 AS wd,
        |  pus - sus AS delay_us FROM fp),
        |rk AS (SELECT wd, delay_us,
        |  row_number() OVER (PARTITION BY wd ORDER BY delay_us) AS r FROM dl),
        |nn AS (SELECT wd, count(*) AS n FROM dl GROUP BY wd),
        |tt AS (SELECT wd, n, q, CAST(ceil(q * n) AS BIGINT) AS r FROM
        |  (SELECT wd, n, unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |    CAST(0.99 AS DOUBLE)]) AS q FROM nn)),
        |pick AS (SELECT tt.wd, tt.n, tt.q, rk.delay_us FROM tt
        |  JOIN rk ON rk.wd = tt.wd AND rk.r = tt.r)
        |SELECT wd,
        | CAST(max(CASE WHEN q = 0.5 THEN delay_us END) AS BIGINT) AS p50_us,
        | CAST(max(CASE WHEN q = 0.9 THEN delay_us END) AS BIGINT) AS p90_us,
        | CAST(max(CASE WHEN q = 0.99 THEN delay_us END) AS BIGINT) AS p99_us,
        | CAST(max(n) AS BIGINT) AS n
        |FROM pick GROUP BY wd ORDER BY wd""".stripMargin,

    "q191_label_noise" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label AS own_label,
         |  CAST(embedding AS DOUBLE[]) AS qv
         | FROM embeddings WHERE vec_id < 200),
         |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id >= 200),
         |scored AS (SELECT query_id, vec_id, label AS nl,
         |  ${sqlCosine("qv", "cv")} AS sim FROM q, c),
         |nn AS (SELECT query_id, nl FROM (SELECT query_id, nl,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id) AS rk FROM scored) WHERE rk <= 5),
         |votes AS (SELECT query_id, nl, count(*) AS c
         |  FROM nn GROUP BY 1, 2),
         |maj AS (SELECT query_id, nl AS majority_label, c AS n_votes
         |  FROM (SELECT query_id, nl, c, row_number() OVER
         |    (PARTITION BY query_id ORDER BY c DESC, nl) AS rk FROM votes)
         |  WHERE rk = 1)
         |SELECT q.query_id, q.own_label, m.majority_label,
         | CAST(m.n_votes AS BIGINT) AS n_votes,
         | q.own_label <> m.majority_label AS mismatch
         |FROM q JOIN maj m ON m.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin,

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

    "q193_source_dup_rate" ->
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
         | GROUP BY 1, 2),
         |jac AS (SELECT com.id1, com.id2,
         |  CAST(com.common AS DOUBLE) / CAST(n1.n + n2.n - com.common
         |    AS DOUBLE) AS jaccard
         | FROM com JOIN n n1 ON n1.doc_id = com.id1
         |          JOIN n n2 ON n2.doc_id = com.id2),
         |pairs AS (SELECT id1, id2 FROM jac WHERE jaccard >= 0.6),
         |ids AS (SELECT DISTINCT id % 1000000 AS doc_id FROM
         |  (SELECT id1 AS id FROM pairs UNION ALL SELECT id2 FROM pairs)),
         |per AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |dup AS (SELECT d.source, count(*) AS n_dup FROM ids
         |  JOIN documents d ON d.doc_id = ids.doc_id GROUP BY 1)
         |SELECT p.source, p.n_docs,
         | CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup_involved,
         | CAST(coalesce(dup.n_dup, 0) * 1000000 AS BIGINT)
         |   // CAST(p.n_docs AS BIGINT) AS dup_ppm
         |FROM per p LEFT JOIN dup ON dup.source = p.source
         |ORDER BY p.source""".stripMargin,

    "q194_burstiness" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |g AS (SELECT event_type, us - lag(us) OVER
        |  (PARTITION BY user_id, event_type ORDER BY us, event_id) AS gap
        | FROM ev),
        |f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
        |m AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(gap AS DECIMAL(19,0))) AS DECIMAL(20,0)) AS s1,
        |  CAST(sum(CAST(CAST(gap AS DECIMAL(19,0)) *
        |    CAST(gap AS DECIMAL(19,0)) AS DECIMAL(38,0)))
        |    AS DECIMAL(34,0)) AS s2
        | FROM f GROUP BY 1),
        |x AS (SELECT event_type, n, s1,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |  sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) -
        |    (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
        | FROM m)
        |SELECT event_type, n, CAST(s1 AS BIGINT) // n AS mean_gap_us,
        | CASE WHEN sd + mu = CAST(0 AS DOUBLE) THEN NULL
        |   ELSE round((sd - mu) / (sd + mu), 6) + CAST(0 AS DOUBLE)
        |   END AS burstiness
        |FROM x ORDER BY event_type""".stripMargin,

    "q195_cluster_histogram" ->
      s"""WITH RECURSIVE $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |edge AS (SELECT id1 AS a, id2 AS b FROM pair
         | UNION SELECT id2 AS a, id1 AS b FROM pair),
         |reach(src, dst) AS (
         | SELECT a, a FROM edge
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN edge e ON e.a = r.dst),
         |lab AS (SELECT src AS id, min(dst) AS cluster FROM reach GROUP BY src),
         |cl AS (SELECT cluster, count(*) AS sz FROM lab GROUP BY 1)
         |SELECT CAST(sz AS BIGINT) AS cluster_size, count(*) AS n_clusters,
         | CAST(sum(sz) AS BIGINT) AS n_docs
         |FROM cl GROUP BY sz ORDER BY cluster_size""".stripMargin,

    "q196_vector_hygiene" ->
      """WITH ex AS (SELECT vec_id, label,
        |  CAST(unnest(CAST(embedding AS DOUBLE[])) AS DECIMAL(12,6)) AS xd
        | FROM embeddings),
        |n2 AS (SELECT vec_id, label,
        |  CAST(sum(CAST(xd * xd AS DECIMAL(27,12))) AS DECIMAL(32,12)) AS n2
        | FROM ex GROUP BY 1, 2)
        |SELECT label, count(*) AS n_vecs,
        | CAST(coalesce(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END), 0)
        |   AS BIGINT) AS n_zero,
        | CAST(coalesce(sum(CASE WHEN n2 > 0 AND
        |   n2 < CAST(0.01 AS DECIMAL(32,12)) THEN 1 ELSE 0 END), 0)
        |   AS BIGINT) AS n_tiny,
        | CAST(coalesce(sum(CASE WHEN n2 > CAST(100 AS DECIMAL(32,12))
        |   THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_oversized
        |FROM n2 GROUP BY label ORDER BY label""".stripMargin,

    "q197_quality_dup_deciles" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(length(text) - length(regexp_replace(text,
         |    '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(list_filter(toks, x -> x IN
         |    ('the','a','of','and','to','in','is','it','for','on')))
         |    AS BIGINT) AS n_stop,
         |  length(text) AS n_chars
         | FROM t),
         |qs AS (SELECT doc_id,
         |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
         |  + (1.0 - (CASE WHEN n_chars = 0 THEN 0.0
         |            ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
         |            END)) * 0.25
         |  + (CASE WHEN n_tokens = 0 THEN 0.0
         |     ELSE CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         |     END) * 0.25 AS q
         | FROM m),
         |rk AS (SELECT doc_id,
         |  row_number() OVER (ORDER BY q, doc_id) AS rn FROM qs),
         |nn AS (SELECT count(*) AS n FROM qs),
         |dec AS (SELECT doc_id, ((rn - 1) * 10) // n + 1 AS decile
         |  FROM rk CROSS JOIN nn),
         |$SqlCorpus,
         |$SqlShingles3,
         |sn AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM com
         | JOIN sn n1 ON n1.doc_id = com.id1 JOIN sn n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |dup AS (SELECT DISTINCT id % 1000000 AS doc_id FROM
         |  (SELECT id1 AS id FROM pairs UNION ALL SELECT id2 FROM pairs))
         |SELECT CAST(dec.decile AS BIGINT) AS decile, count(*) AS n_docs,
         | CAST(coalesce(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0
         |   END), 0) AS BIGINT) AS n_dup,
         | CAST(coalesce(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0
         |   END), 0) * 1000000 AS BIGINT) // CAST(count(*) AS BIGINT)
         |   AS dup_ppm
         |FROM dec LEFT JOIN dup ON dup.doc_id = dec.doc_id
         |GROUP BY dec.decile ORDER BY decile""".stripMargin,

    "q198_seasonality" ->
      // part x weekday chi-square over the top-10 parts; weekday from
      // epoch-day arithmetic (engine dayofweek conventions differ);
      // full-grid zero cells per the q176 operator contract
      """WITH rows0 AS (SELECT DISTINCT l.l_orderkey AS ok,
        |  l.l_partkey AS pk FROM lineitem l),
        |rws AS (SELECT r.pk,
        |  ((CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' + 4) % 7) AS wd
        | FROM rows0 r JOIN orders o ON o.o_orderkey = r.ok),
        |top AS (SELECT pk FROM (SELECT pk, count(*) AS n FROM rws
        |  GROUP BY pk ORDER BY n DESC, pk LIMIT 10)),
        |f AS (SELECT CAST(rws.pk AS BIGINT) AS a, wd AS b FROM rws
        |  JOIN top ON top.pk = rws.pk),
        |cells AS (SELECT a, b, count(*) AS o FROM f GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |  count(DISTINCT a) AS n_a, count(DISTINCT b) AS n_b FROM cells),
        |grid AS (SELECT rt.a, ct.b, rt.r, ct.c, coalesce(cells.o, 0) AS o
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
        |terms AS (SELECT t.n, t.n_a, t.n_b,
        |  CAST(round(CAST(CAST(g.o * t.n - g.r * g.c AS DECIMAL(19,0)) *
        |      CAST(g.o * t.n - g.r * g.c AS DECIMAL(19,0)) AS DOUBLE) /
        |    CAST(t.n * g.r * g.c AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
        | FROM grid g CROSS JOIN tot t),
        |agg AS (SELECT n, n_a, n_b, CAST(sum(term) AS DECIMAL(28,6)) AS chi2d
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT n, n_a, n_b, CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
        |  CAST(chi2d AS DOUBLE) AS chi2,
        |  CASE WHEN least(n_a, n_b) <= 1 THEN NULL
        |    ELSE round(sqrt(CAST(chi2d AS DOUBLE) /
        |      CAST(n * (least(n_a, n_b) - 1) AS DOUBLE)), 6) END AS cramers_v
        |FROM agg""".stripMargin,

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

    "q201_forget_cascade" ->
      """WITH f AS (SELECT c_custkey AS k FROM customer
        |  WHERE c_custkey % 97 = 0),
        |ck AS (SELECT count(*) AS n FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM f WHERE f.k = c.c_custkey)),
        |ok AS (SELECT count(*) AS n FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM f WHERE f.k = o.o_custkey)),
        |okeys AS (SELECT o_orderkey FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM f WHERE f.k = o.o_custkey)),
        |lk AS (SELECT count(*) AS n FROM lineitem l
        |  WHERE EXISTS (SELECT 1 FROM okeys WHERE o_orderkey = l.l_orderkey)),
        |r AS (
        | SELECT 'customer' AS table_name,
        |  (SELECT count(*) FROM customer) AS n_total,
        |  (SELECT n FROM ck) AS n_kept
        | UNION ALL SELECT 'lineitem', (SELECT count(*) FROM lineitem),
        |  (SELECT n FROM lk)
        | UNION ALL SELECT 'orders', (SELECT count(*) FROM orders),
        |  (SELECT n FROM ok))
        |SELECT table_name, n_total, n_kept, n_total - n_kept AS n_removed
        |FROM r ORDER BY table_name""".stripMargin,

    "q202_journey_trigrams" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |j AS (SELECT event_type AS step1,
        |  lead(event_type, 1) OVER w AS step2,
        |  lead(event_type, 2) OVER w AS step3
        | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT step1, step2, step3, count(*) AS n
        |FROM j WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin,

    "q203_transition_dwell" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |j AS (SELECT event_type AS from_type,
        |  lead(event_type, 1) OVER w AS to_type,
        |  lead(us, 1) OVER w - us AS gap
        | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT from_type, to_type, count(*) AS n,
        | CAST(CAST(sum(CAST(gap AS DECIMAL(19,0))) AS BIGINT)
        |   AS BIGINT) // count(*) AS mean_gap_us,
        | CAST(max(gap) AS BIGINT) AS max_gap_us
        |FROM j WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    "q204_asof_native" ->
      // same oracle as q44: DuckDB's native ASOF LEFT JOIN — here it
      // verifies the custom AsofJoinExec physical operator
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q205_watermark_sizing" ->
      """WITH ev AS (SELECT event_type, event_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |l AS (SELECT event_type,
        |  greatest(max(us) OVER (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us, 0)
        |    AS late
        | FROM ev)
        |SELECT event_type, count(*) AS n,
        | CAST(coalesce(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END), 0)
        |   AS BIGINT) AS n_late,
        | CAST(max(late) AS BIGINT) AS max_late_us,
        | CAST(CAST(sum(CAST(late AS DECIMAL(19,0))) AS BIGINT) AS BIGINT)
        |   // count(*) AS mean_late_us
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q206_survivor_audit" ->
      // q104's survivor election replayed, then the pair set
      // semi-checked from both ends: intra-cluster pairs keep one
      // member, so zero residual pairs is the exact invariant
      s"""WITH RECURSIVE $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |edge AS (SELECT id1 AS a, id2 AS b FROM pair
         | UNION SELECT id2 AS a, id1 AS b FROM pair),
         |reach(src, dst) AS (
         | SELECT a, a FROM edge
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN edge e ON e.a = r.dst),
         |lab AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |        FROM reach GROUP BY src),
         |qual AS (SELECT c.doc_id,
         | least(CAST(len(t.toks) AS DOUBLE) / 100.0, 1.0) * 0.5
         | + (1.0 - (CASE WHEN length(c.text) = 0 THEN 0.0
         |    ELSE CAST(length(c.text) - length(regexp_replace(c.text,
         |           '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
         |         / CAST(length(c.text) AS DOUBLE) END)) * 0.25
         | + (CASE WHEN len(t.toks) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(t.toks, x -> x IN
         |           ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
         |         / CAST(len(t.toks) AS DOUBLE) END) * 0.25 AS quality
         | FROM corpus c JOIN tok t ON t.doc_id = c.doc_id),
         |m AS (SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
         |        q.quality
         |      FROM qual q LEFT JOIN lab l ON l.doc_id = q.doc_id),
         |surv AS (SELECT doc_id FROM (SELECT doc_id,
         |        row_number() OVER (PARTITION BY cluster_id
         |                           ORDER BY quality DESC, doc_id) AS rk
         |      FROM m) WHERE rk = 1),
         |resid AS (SELECT count(*) AS n_residual_pairs FROM pair
         |  WHERE EXISTS (SELECT 1 FROM surv WHERE doc_id = pair.id1)
         |    AND EXISTS (SELECT 1 FROM surv WHERE doc_id = pair.id2))
         |SELECT (SELECT count(*) FROM surv) AS n_survivors,
         | CAST(n_residual_pairs AS BIGINT) AS n_residual_pairs,
         | n_residual_pairs = 0 AS invariant_holds
         |FROM resid""".stripMargin,

    "q207_stream_windows" ->
      // the q37 batch oracle — here the Spark side actually executes
      // the Structured Streaming engine (micro-batches + state store)
      // and drains its complete-mode output to a batch frame
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

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

    "q210_stream_dedup" ->
      // the order-invariant contract of the streaming keyed dedup:
      // exactly one surviving row per key, no key lost or invented
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",

    "q211_stream_sessions" ->
      // q43's gaps-and-islands oracle vs the streaming session-window
      // state store (sessions must merge identically across triggers)
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
        |m AS (SELECT user_id, t, value,
        |  CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |       OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        | FROM e),
        |g AS (SELECT user_id, t, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS grp
        | FROM m)
        |SELECT min(t) AS session_start, user_id, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, grp ORDER BY user_id, session_start""".stripMargin,

    "q212_stream_append" ->
      // append-mode emission contract: exactly the windows whose END
      // the final watermark (max event time, delay 0) passed
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value
        |  FROM events)
        |SELECT time_bucket(INTERVAL 1 HOUR, t) AS window_start,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e
        |GROUP BY 1, 2
        |HAVING window_start + INTERVAL 1 HOUR <= (SELECT max(t) FROM e)
        |ORDER BY window_start, event_type""".stripMargin,

    "q213_stream_interval_join" ->
      // the q45 shape via the two-sided stream-stream join state store:
      // per-click count of same-user views within +/- 5 minutes
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  CAST(ts AS TIMESTAMP) AS t FROM events WHERE user_id < 300),
        |clicks AS (SELECT user_id, event_id, t FROM ev
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id AS v_user, t AS v_t FROM ev
        |  WHERE event_type = 'view')
        |SELECT c.user_id, c.event_id, count(*) AS n_views_nearby
        |FROM clicks c JOIN views v
        |  ON v.v_user = c.user_id
        | AND v.v_t >= c.t - INTERVAL 5 MINUTE
        | AND v.v_t <= c.t + INTERVAL 5 MINUTE
        |GROUP BY c.user_id, c.event_id
        |ORDER BY c.event_id""".stripMargin,

    "q220_weighted_jaccard" ->
      // integer milli IDF weights (one rounded ln per shingle type),
      // exact BIGINT weight sums, rounded divide per pair
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM corpus),
         |wt AS (SELECT sh, count(*) AS df FROM s GROUP BY sh
         |  HAVING count(*) <= 1000),
         |w AS (SELECT wt.sh,
         |  CAST(round(ln(CAST(nn.n AS DOUBLE) / CAST(wt.df AS DOUBLE))
         |    * 1000) AS BIGINT) AS w
         | FROM wt CROSS JOIN nn),
         |ws AS (SELECT s.doc_id, s.sh, w.w FROM s JOIN w USING (sh)),
         |tot AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tw
         |  FROM ws GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |  CAST(sum(x.w) AS BIGINT) AS cw
         | FROM ws x JOIN ws y ON x.sh = y.sh AND x.doc_id < y.doc_id
         | GROUP BY 1, 2)
         |SELECT com.id1, com.id2, com.cw,
         | round(CAST(com.cw AS DOUBLE) /
         |   CAST(t1.tw + t2.tw - com.cw AS DOUBLE), 6) AS wjaccard
         |FROM com JOIN tot t1 ON t1.doc_id = com.id1
         |JOIN tot t2 ON t2.doc_id = com.id2
         |WHERE t1.tw + t2.tw - com.cw > 0
         |  AND round(CAST(com.cw AS DOUBLE) /
         |   CAST(t1.tw + t2.tw - com.cw AS DOUBLE), 6) >= 0.25
         |ORDER BY com.id1, com.id2""".stripMargin,

    "q221_asof_nearest" ->
      // both ASOF directions + the closest-pick CASE (ties backward);
      // interval comparison == the Spark side's ns-long comparison
      // because ts is microsecond-aligned on both engines
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts),
        |b AS (SELECT c.user_id, c.event_id, c.ts, c.value,
        |   v.view_value AS bv, v.ts AS bt
        | FROM clicks c ASOF LEFT JOIN views v
        |   ON c.user_id = v.user_id AND c.ts >= v.ts),
        |f AS (SELECT c.event_id, v.view_value AS fv, v.ts AS ft
        | FROM clicks c ASOF LEFT JOIN views v
        |   ON c.user_id = v.user_id AND c.ts <= v.ts)
        |SELECT b.user_id, b.event_id, b.value,
        | round(CASE WHEN f.fv IS NULL THEN b.bv
        |       WHEN b.bv IS NULL THEN f.fv
        |       WHEN (b.ts - b.bt) <= (f.ft - b.ts) THEN b.bv
        |       ELSE f.fv END, 6) AS view_value
        |FROM b JOIN f ON f.event_id = b.event_id
        |ORDER BY b.event_id""".stripMargin,

    "q222_source_dup_matrix" ->
      // the q24/q206 pair SQL, base ids folded (+1M/+2M copies ->
      // originals), mapped to sources, counted per unordered pair
      s"""WITH $SqlCorpus,
         |$SqlShingles3,
         |n AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |com AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS common
         | FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
         | GROUP BY 1, 2),
         |pair AS (SELECT com.id1, com.id2 FROM com
         | JOIN n n1 ON n1.doc_id = com.id1 JOIN n n2 ON n2.doc_id = com.id2
         | WHERE CAST(com.common AS DOUBLE)
         |   / CAST(n1.n + n2.n - com.common AS DOUBLE) >= 0.6),
         |m AS (SELECT id1 % 1000000 AS b1, id2 % 1000000 AS b2 FROM pair),
         |j AS (SELECT least(d1.source, d2.source) AS source_a,
         |   greatest(d1.source, d2.source) AS source_b
         | FROM m JOIN documents d1 ON d1.doc_id = m.b1
         | JOIN documents d2 ON d2.doc_id = m.b2)
         |SELECT source_a, source_b, count(*) AS n_pairs FROM j
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    "q223_transition_entropy" ->
      // q203's transition frame; per-pair c*round(ln(c/ca),6) summed
      // in DECIMAL; H = -sum/T
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us FROM events),
        |tr AS (SELECT event_type AS a,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS b
        | FROM ev),
        |p AS (SELECT a, b, count(*) AS c FROM tr WHERE b IS NOT NULL
        |  GROUP BY 1, 2),
        |ft AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM p GROUP BY a),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS n_pairs
        |  FROM p),
        |terms AS (SELECT tot.t, tot.n_pairs,
        |  CAST(p.c * CAST(round(ln(CAST(p.c AS DOUBLE)
        |      / CAST(ft.ca AS DOUBLE)), 6) AS DECIMAL(18,6))
        |    AS DECIMAL(28,6)) AS term
        | FROM p JOIN ft USING (a) CROSS JOIN tot),
        |agg AS (SELECT t, n_pairs, CAST(sum(term) AS DECIMAL(28,6)) AS s
        |  FROM terms GROUP BY 1, 2)
        |SELECT t AS n_transitions, n_pairs, CAST(s AS DOUBLE) AS sum_clogp,
        | round(-CAST(s AS DOUBLE) / CAST(t AS DOUBLE) + 0.0, 6) AS cond_entropy
        |FROM agg""".stripMargin,

    "q224_centroid_drift" ->
      // q99's DECIMAL(18,10) quantization; n cancels out of the
      // centroid cosine, so only exact component sums are needed
      s"""WITH ex AS (
         |  SELECT label AS g, generate_subscripts(embedding, 1) - 1 AS i,
         |         CAST(unnest(CAST(embedding AS DOUBLE[])) AS DECIMAL(18,10)) AS x
         |  FROM embeddings),
         |s AS (SELECT g, i, CAST(sum(x) AS DECIMAL(18,10)) AS sx
         |      FROM ex GROUP BY g, i),
         |nrm AS (SELECT g, CAST(sum(sx * sx) AS DECIMAL(38,20)) AS nrm
         |      FROM s GROUP BY g),
         |dots AS (SELECT a.g AS ga, b.g AS gb,
         |    CAST(sum(a.sx * b.sx) AS DECIMAL(38,20)) AS dot
         |  FROM s a JOIN s b ON a.i = b.i AND a.g < b.g GROUP BY 1, 2)
         |SELECT d.ga AS label_a, d.gb AS label_b,
         | round(CAST(d.dot AS DOUBLE) /
         |   sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 6)
         |   AS centroid_cosine
         |FROM dots d JOIN nrm na ON na.g = d.ga JOIN nrm nb ON nb.g = d.gb
         |ORDER BY label_a, label_b""".stripMargin,

    "q214_stream_upsert" ->
      // cross-batch upsert: the final target is each user's LATEST
      // month row (later batches overwrite, unseen users insert)
      """WITH ev AS (SELECT user_id,
        |  date_trunc('month', CAST(ts AS TIMESTAMP)) AS m,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        | FROM events GROUP BY 1, 2),
        |last AS (SELECT user_id, max(m) AS m FROM ev GROUP BY user_id)
        |SELECT ev.user_id, ev.m, ev.n_events, ev.sum_value
        |FROM ev JOIN last ON last.user_id = ev.user_id AND last.m = ev.m
        |ORDER BY ev.user_id""".stripMargin,

    "q215_mutual_info" ->
      // observed cells only (zero cells contribute 0 to MI); per-cell
      // c*round(ln(c*n/(r*cc)),6) summed in DECIMAL
      """WITH cells AS (SELECT lang AS a, source AS b, count(*) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |  count(DISTINCT a) AS n_a, count(DISTINCT b) AS n_b FROM cells),
        |terms AS (SELECT t.n, t.n_a, t.n_b,
        |  CAST(cells.o * CAST(round(ln(CAST(cells.o * t.n AS DOUBLE) /
        |      CAST(rt.r * ct.c AS DOUBLE)), 6) AS DECIMAL(18,6))
        |    AS DECIMAL(28,6)) AS term
        | FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot t),
        |agg AS (SELECT n, n_a, n_b, CAST(sum(term) AS DECIMAL(28,6)) AS s
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT n, n_a, n_b, CAST(s AS DOUBLE) AS sum_cmi,
        | round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mi
        |FROM agg""".stripMargin,

    "q216_cohort_retention" ->
      // first-activity DAY cohorts (epoch days); exact integer ppm
      """WITH ev AS (SELECT user_id,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS p
        | FROM events),
        |f AS (SELECT user_id, min(p) AS cohort FROM ev GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, p FROM ev),
        |cnt AS (SELECT f.cohort, act.p - f.cohort AS k,
        |  count(*) AS n_active
        | FROM act JOIN f ON f.user_id = act.user_id GROUP BY 1, 2),
        |sz AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY cohort)
        |SELECT cnt.cohort, cnt.k, cnt.n_active, sz.cohort_size,
        | CAST(cnt.n_active * 1000000 // sz.cohort_size AS BIGINT)
        |   AS retention_ppm
        |FROM cnt JOIN sz ON sz.cohort = cnt.cohort
        |ORDER BY cnt.cohort, cnt.k""".stripMargin,

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

  )

  /** Unrolled per-language TextRank oracle (see q179 /
    * [[operators.TextRank]]): weighted PageRank rounds in INTEGER
    * micro-units — every rounding is (2a+b) DIV (2b), so no float
    * exists until the final display division (iterated 6-dp float
    * rounding diverges across engines at .5-ulp boundaries).
    */
  private def textRankSql(rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""c$i AS (SELECT m.lang, m.v,
    CAST(sum((2 * p.pr * m.w + st.wu) // (2 * st.wu)) AS BIGINT) AS cs
  FROM m JOIN st ON st.lang = m.lang AND st.u = m.u
  JOIN pr${i - 1} p ON p.lang = m.lang AND p.u = m.u GROUP BY 1, 2),
pr$i AS (SELECT st.lang, st.u,
    (300000 + n) // (2 * n) + (34 * coalesce(cs, 0) + 20) // 40 AS pr
  FROM st JOIN ng USING (lang)
  LEFT JOIN c$i ON c$i.lang = st.lang AND c$i.v = st.u)"""
    }.mkString(",\n")
    s"""WITH tok AS (SELECT lang, $SqlToks AS toks FROM documents),
p AS (SELECT lang, unnest(list_transform(generate_series(1, len(toks) - 1),
    i -> [toks[i], toks[i + 1]])) AS pr
  FROM tok WHERE len(toks) >= 2),
pares AS (SELECT lang, pr[1] AS wa, pr[2] AS wb FROM p WHERE pr[1] <> pr[2]),
ed AS (SELECT lang, least(wa, wb) AS a, greatest(wa, wb) AS b,
    count(*) AS w
  FROM pares GROUP BY 1, 2, 3 HAVING count(*) >= 3),
m AS MATERIALIZED (SELECT lang, a AS u, b AS v, w FROM ed
  UNION ALL SELECT lang, b, a, w FROM ed),
st AS MATERIALIZED (SELECT lang, u, sum(w) AS wu FROM m GROUP BY 1, 2),
ng AS (SELECT lang, count(*) AS n FROM st GROUP BY lang),
pr0 AS (SELECT st.lang, st.u, (2000000 + n) // (2 * n) AS pr
  FROM st JOIN ng USING (lang)),
$iters,
rk AS (SELECT lang, u, pr, row_number() OVER
  (PARTITION BY lang ORDER BY pr DESC, u) AS rk FROM pr$rounds)
SELECT lang, u AS token,
  CAST(pr AS DOUBLE) / CAST(1000000 AS DOUBLE) AS rank_score,
  CAST(rk AS INT) AS rk
FROM rk WHERE rk <= 10 ORDER BY lang, rk"""
  }

  /** Unrolled bounded Bellman–Ford oracle (see q181 /
    * [[operators.Sssp]]): round i takes the per-node min over the
    * previous distances and all one-edge relaxations. DECIMAL(12,6)
    * distances end to end.
    */
  private def ssspSql(rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""c$i AS (SELECT e.v AS node,
    min(CAST(d.dist + e.w AS DECIMAL(12,6))) AS dist
  FROM d${i - 1} d JOIN e ON e.u = d.node GROUP BY e.v),
d$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM
  (SELECT node, dist FROM d${i - 1} UNION ALL SELECT node, dist FROM c$i)
  GROUP BY node)"""
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
    FROM lineitem),
sup AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_both
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS MATERIALIZED (SELECT CAST(pa AS BIGINT) AS u, CAST(pb AS BIGINT) AS v,
    CAST(round(CAST(1 AS DOUBLE) / CAST(n_both AS DOUBLE), 6)
      AS DECIMAL(12,6)) AS w
  FROM sup
  UNION ALL SELECT CAST(pb AS BIGINT), CAST(pa AS BIGINT),
    CAST(round(CAST(1 AS DOUBLE) / CAST(n_both AS DOUBLE), 6)
      AS DECIMAL(12,6))
  FROM sup),
d0 AS (SELECT DISTINCT u AS node, CAST(0 AS DECIMAL(12,6)) AS dist
  FROM e WHERE u <= 50),
$iters
SELECT node, CAST(dist AS DOUBLE) AS dist FROM d$rounds ORDER BY node"""
  }

  /** Unrolled dyadic-EWMA oracle (see q178 / [[operators.Ewma]]):
    * `window` lag terms with power-of-two weights, truncated weights
    * renormalized by the Σ actually present — exact integer num/den,
    * one rounded divide per row.
    */
  private def ewmaSql(w: Int): String = {
    val num = (0 until w).map { i =>
      val wt = 1L << (w - 1 - i)
      if (i == 0) s"cents * $wt"
      else s"coalesce(lag(cents, $i) OVER win * $wt, 0)"
    }.mkString(" + ")
    val den = (0 until w).map { i =>
      val wt = 1L << (w - 1 - i)
      if (i == 0) s"$wt"
      else s"CASE WHEN lag(cents, $i) OVER win IS NOT NULL THEN $wt ELSE 0 END"
    }.mkString(" + ")
    s"""WITH ev AS (SELECT user_id, event_id,
    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
   FROM events WHERE user_id < 100)
SELECT user_id, event_id, us, cents,
  round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) AS ewma
FROM ev
WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id)
ORDER BY user_id, us, event_id"""
  }

  /** Unrolled fixed-budget k-core peel oracle over the ≥2-support
    * co-purchase graph (see q148): round i keeps nodes with ≥ k
    * surviving neighbors and restricts the edge set to kept endpoints.
    */
  private def kcorePeelSql(rounds: Int, k: Int): String = {
    // each e_{i-1} is referenced twice (k_i and e_i) — MATERIALIZED
    // stops the reference tree from re-expanding to the base scan
    val peels = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u
        HAVING count(*) >= $k),
e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
        JOIN k$i a ON e.u = a.u JOIN k$i b ON e.v = b.u)"""
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
sup AS (SELECT a.pk AS pa, b.pk AS pb
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk HAVING count(*) >= 2),
e0 AS MATERIALIZED (SELECT CAST(pa AS BIGINT) AS u, CAST(pb AS BIGINT) AS v
       FROM sup
       UNION SELECT CAST(pb AS BIGINT), CAST(pa AS BIGINT) FROM sup),
$peels
SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
FROM e$rounds GROUP BY u ORDER BY node"""
  }

  /** Unrolled k-truss peel oracle over the FULL co-purchase graph —
    * no ≥2-support slice; the `sup` CTE has no HAVING, matching q218's
    * Spark side over the full `edges` artifact (see q218 /
    * [[operators.KTruss]]): per round, triangles by
    * id-ordered triple enumeration (support is orientation-
    * independent, so the oracle may use the simple orientation),
    * per-edge support by a 3-way UNION ALL + count, edges below
    * k−2 dropped. MATERIALIZED throughout — every e_i is referenced
    * by three triangle legs AND the filter.
    */
  private def kTrussSql(rounds: Int, k: Int): String = {
    val peels = (1 to rounds).map { i =>
      s"""tr$i AS MATERIALIZED (SELECT a.lo AS x, a.hi AS y, b.hi AS z
  FROM e${i - 1} a JOIN e${i - 1} b ON b.lo = a.lo AND b.hi > a.hi
  JOIN e${i - 1} c ON c.lo = a.hi AND c.hi = b.hi),
s$i AS MATERIALIZED (SELECT lo, hi, count(*) AS s FROM (
  SELECT x AS lo, y AS hi FROM tr$i
  UNION ALL SELECT x AS lo, z AS hi FROM tr$i
  UNION ALL SELECT y AS lo, z AS hi FROM tr$i) GROUP BY 1, 2),
e$i AS MATERIALIZED (SELECT e.lo, e.hi FROM e${i - 1} e
  LEFT JOIN s$i ON s$i.lo = e.lo AND s$i.hi = e.hi
  WHERE coalesce(s$i.s, 0) >= ${k - 2})"""
    }.mkString(",\n")
    val f = rounds + 1
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
sup AS (SELECT a.pk AS pa, b.pk AS pb
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk),
e0 AS MATERIALIZED (SELECT CAST(pa AS BIGINT) AS lo, CAST(pb AS BIGINT) AS hi
       FROM sup),
$peels,
tr$f AS MATERIALIZED (SELECT a.lo AS x, a.hi AS y, b.hi AS z
  FROM e$rounds a JOIN e$rounds b ON b.lo = a.lo AND b.hi > a.hi
  JOIN e$rounds c ON c.lo = a.hi AND c.hi = b.hi),
s$f AS MATERIALIZED (SELECT lo, hi, count(*) AS s FROM (
  SELECT x AS lo, y AS hi FROM tr$f
  UNION ALL SELECT x AS lo, z AS hi FROM tr$f
  UNION ALL SELECT y AS lo, z AS hi FROM tr$f) GROUP BY 1, 2)
SELECT e.lo, e.hi, CAST(coalesce(s$f.s, 0) AS BIGINT) AS support
FROM e$rounds e LEFT JOIN s$f ON s$f.lo = e.lo AND s$f.hi = e.hi
ORDER BY e.lo, e.hi"""
  }
}
