package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
  * PageRank over the token adjacency graph — tokens are nodes, an
  * edge joins tokens that appear adjacent anywhere in the corpus,
  * edge weight = adjacency count. High-rank tokens are the corpus's
  * structural keywords (central in context, not merely frequent —
  * the graph distinguishes connective hubs from repeated filler).
  *
  * Scale shape: everything is keyed by (group, token) — one explode +
  * hash agg builds the weighted edge list, each iteration is ONE
  * edge-keyed hash join + ONE hash agg (PageRank's cost shape, run
  * per group in the same frames — no per-group driver loop). The
  * iteration count is fixed and small; vocabulary (not corpus size)
  * bounds the graph.
  *
  * Exactness: scores live in INTEGER micro-units (1e-6) end to end.
  * Iterated 6-dp float rounding is a cross-engine hazard — a product
  * landing on a .5 ulp boundary rounds differently from a double's
  * shortest decimal repr (JVM `round`) than from its binary value
  * (DuckDB), and thousands of iterated roundings make a boundary hit
  * near-certain. Every rounding here is instead the integer identity
  * round(a/b) = (2a + b) DIV (2b) for positives — no float exists
  * anywhere until the final display division.
  */
object TextRank {

  /** Top-k tokens per group by TextRank score.
    * Input: `(groupCol, toksCol: array<string>)` rows (one per doc).
    * `minEdgeCount` prunes hapax adjacencies (noise + graph size);
    * damping 0.85. Returns `(group, token, rank_score, rk)`.
    */
  def keywords(docs: DataFrame, groupCol: String, toksCol: String,
               rounds: Int = 2, minEdgeCount: Long = 3,
               topK: Int = 10): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(groupCol).as("g"), col(toksCol).as("toks"))
    // adjacent pairs: zip the token list against its own tail — one
    // scan-stage generator, no positional self-join
    val pairs = base.select(col("g"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0)))))
          .as("p"))
      .select(col("g"), col("p.0").as("wa"), col("p.1").as("wb"))
      .filter(col("wa") =!= col("wb"))
    val edges = pairs
      .select(col("g"), least(col("wa"), col("wb")).as("a"),
        greatest(col("wa"), col("wb")).as("b"))
      .groupBy("g", "a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minEdgeCount)
    // each iteration joins m and strength — persist both once (the
    // corpus explode + edge agg would otherwise re-run per round);
    // released by the session's Retained.releaseAll
    import org.apache.spark.storage.StorageLevel
    val m = Retained.track(
      edges.select(col("g"), col("a").as("u"), col("b").as("v"), col("w"))
        .unionAll(edges.select(col("g"), col("b").as("u"), col("a").as("v"),
          col("w")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val strength = Retained.track(
      m.groupBy("g", "u").agg(sum(col("w")).as("wu"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val nPerG = strength.groupBy("g").agg(count(lit(1)).as("n"))
    // micro-unit start: round(1e6/n) as an integer half-up division
    var pr = strength.join(nPerG, Seq("g"))
      .select(col("g"), col("u"),
        expr("(2000000 + n) DIV (2 * n)").as("pr"))
    for (_ <- 1 to rounds) {
      // per-edge contribution round(pr·w/wu) in micro-units
      val contrib = m.join(strength, Seq("g", "u")).join(pr, Seq("g", "u"))
        .select(col("g"), col("v"),
          expr("(2 * pr * w + wu) DIV (2 * wu)").as("c"))
        .groupBy("g", "v").agg(sum(col("c")).as("cs"))
      // pr' = round(0.15e6/n) + round(0.85·cs) = base + (34·cs+20) DIV 40
      pr = strength.select(col("g"), col("u")).join(nPerG, Seq("g"))
        .join(contrib.withColumnRenamed("v", "u"), Seq("g", "u"), "left")
        .select(col("g"), col("u"),
          expr("(300000 + n) DIV (2 * n) + " +
            "(34 * coalesce(cs, 0) + 20) DIV 40").as("pr"))
    }
    val w = Window.partitionBy("g").orderBy(col("pr").desc, col("u"))
    pr.withColumn("rk", row_number().over(w)) // WindowGroupLimit prunes
      .filter(col("rk") <= topK)
      .select(col("g").as("group"), col("u").as("token"),
        (col("pr").cast("double") / lit(1000000.0)).as("rank_score"),
        col("rk").cast("int").as("rk"))
  }
}
