package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance record linkage — the classic dirty-catalog /
  * entity-resolution primitive (Fellegi–Sunter blocking + Levenshtein
  * verification; see also the PPJoin family in [[TextDedup]] for the
  * token-set analog). A naive fuzzy self-join is n² string comparisons;
  * the scalable shape is:
  *
  *  1. '''block''' — candidates must share a cheap equality key (here:
  *     caller-chosen columns), turning the cross product into a
  *     per-block one. Blocks hash-partition, so the join parallelizes
  *     by block and AQE handles block-size skew.
  *  2. '''length band''' — `levenshtein(a,b) ≥ |len(a)−len(b)|`, so a
  *     band predicate on the two PRECOMPUTED lengths prunes most pairs
  *     before any edit-distance work (a range condition the planner
  *     keeps inside the same hash join — no extra shuffle).
  *  3. '''verify''' — the built-in codegen'd `levenshtein` with the
  *     3-arg threshold form, which abandons a pair's DP matrix as soon
  *     as the running minimum exceeds `maxDist` (O(maxDist·len) per
  *     pair instead of O(len²)).
  *
  * Both Spark and any portable oracle implement classic
  * Wagner–Fischer: edit distance is an exact integer, so results are
  * engine-independent — no float tolerance anywhere.
  */
object FuzzyJoin {

  /** All intra-block pairs `(id_a, id_b, text_a, text_b, dist)` with
    * `dist = levenshtein(text_a, text_b) ≤ maxDist`, `id_a < id_b`.
    *
    * `df` must carry `idCol` (unique, numeric or orderable), `textCol`
    * and the `blockCols`. Pairs crossing blocks are — by design —
    * never considered: the caller's blocking key is the recall
    * contract, exactly as in production entity resolution.
    */
  def blockedLevenshtein(df: DataFrame, idCol: String, textCol: String,
                         blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "blockedLevenshtein needs a blocking key")
    val base = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        col(textCol).as("__t") :+ length(col(textCol)).as("__len"): _*)
    // the verify stage's CPU is O(pairs), not O(rows): a small single
    // file input scans as 1-2 partitions and would serialize the whole
    // pair expansion — spread the STREAM side round-robin so every core
    // verifies its share (broadcast side reaches all tasks regardless)
    val spread = base.repartition(df.sparkSession.sparkContext.defaultParallelism)
    val a = spread.columns.foldLeft(spread)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduce(_ && _)
    a.join(b,
        blockEq &&
          col(s"a_$idCol") < col(s"b_$idCol") &&
          abs(col("a___len") - col("b___len")) <= maxDist)
      .withColumn("dist", levenshtein(col("a___t"), col("b___t"), maxDist))
      // the threshold form returns -1 once the bound is exceeded
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"),
        col("a___t").as("text_a"), col("b___t").as("text_b"), col("dist"))
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo,
    * SIGMOD'95): rank records by a fuzzy-clustering sort key, compare
    * only pairs within `window` rank positions, verify with bounded
    * Levenshtein. The complement to [[blockedLevenshtein]]'s hard
    * blocking — near-matches that STRADDLE a block boundary (the
    * classic blocking failure) are still adjacent in sort order. The
    * rank is [[Ordinals.withOrderedOrdinal]] (range-partitioned
    * distributed sort, no global window); the rank-band pairing is
    * [[TemporalJoins.bandedRangeJoin]] on the rank line — candidate
    * count is exactly `window` per record, O(n·window) total, never
    * n². Returns `(id_a, id_b, gap, dist)` with `id_a` the lower-RANK
    * member.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, textCol: String,
                         sortCols: Seq[org.apache.spark.sql.Column],
                         window: Int, maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ranked = Ordinals.withOrderedOrdinal(df, sortCols, name = "__rn")
      .select(col(idCol).as("__id"), col(textCol).as("__t"), col("__rn"))
    val a = ranked.select(col("__id").as("id_a"), col("__t").as("ta"),
      col("__rn").as("ra"))
    val b = ranked.select(col("__id").as("id_b"), col("__t").as("tb"),
      col("__rn").as("rb"))
    TemporalJoins.bandedRangeJoin(a, b, keys = Seq.empty,
        leftTs = "ra", rightTs = "rb", lower = 1L, upper = window.toLong)
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), (col("rb") - col("ra")).as("gap"),
        col("dist"))
  }
}
