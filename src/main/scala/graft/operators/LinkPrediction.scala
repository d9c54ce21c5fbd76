package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-based link prediction and item-item similarity over an
  * undirected graph — the classic recommender/graph-completion pair:
  *
  *  - Adamic–Adar (Adamic & Adar 2003, "Friends and neighbors on the
  *    web"): score(u,v) = Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg w). The standard
  *    "which absent edge is most likely" baseline; also the workhorse
  *    feature for dedup-graph densification (two near-dup clusters
  *    that share many neighbors probably belong together).
  *  - Item-item cosine collaborative filtering (Sarwar et al. WWW'01):
  *    score(a,b) = n_both / √(n_a · n_b) over co-occurrence counts —
  *    the "customers who bought X also bought Y" face.
  *
  * Scale shape: everything is node-keyed hash joins and hash aggs —
  * no driver-side graph, no cartesian stage. The common-neighbor
  * enumeration is the wedge join through the shared neighbor w, which
  * costs O(Σ_w deg(w)²); a hub cap (`maxWedgeDegree`) bounds that the
  * same way TextDedup's `maxShingleDocFreq` bounds hot shingles. The
  * cap is principled for Adamic–Adar specifically: a hub's weight is
  * 1/ln(deg) — the score mass it contributes is the smallest in the
  * sum — so dropping mega-hubs trades negligible score for removing
  * the quadratic term (documented recall effect, spec-pinned).
  */
object LinkPrediction {

  /** Top-k non-edges ranked by Adamic–Adar score:
    * `(u, v, n_common, aa_score)` with u < v, existing edges excluded.
    *
    * Weights are `round(1/ln(deg w), 6)` held in DECIMAL so the
    * score is an order-independent exact sum (both engines agree
    * bit-for-bit); ties break on (u, v).
    */
  def adamicAdarTopK(edges: DataFrame, srcCol: String, dstCol: String,
                     maxWedgeDegree: Int = 10000,
                     topK: Int = 50): DataFrame = {
    val e = Triangles.canonicalEdges(edges, srcCol, dstCol)
    val m = e.select(col("lo").as("u"), col("hi").as("v"))
      .unionAll(e.select(col("hi").as("u"), col("lo").as("v")))
    val deg = m.groupBy(col("u").as("w")).agg(count(lit(1)).as("deg"))
    // wedge centers: every w contributes deg(w)² wedge rows — cap the
    // hubs (their 1/ln weight is the smallest term in any score).
    // deg = 1 ⇒ ln(deg) = 0: the weight is NULL on both engines (a
    // degree-1 center closes no wedge, so it never reaches the output
    // anyway) — but under ANSI (Spark 4 default) a RAW divide THROWS
    // whenever the planner evaluates this projection eagerly (fused
    // into the degree agg's output ahead of the wedge join, as the
    // SMJ-shaped plans do; broadcast-shaped plans defer it past the
    // join, which is why the r14 driver-bench DIVIDE_BY_ZERO came and
    // went with plan shape). The deg >= 2 guard makes the expression
    // total — identical results at every plan shape.
    val centers = deg.filter(col("deg") <= maxWedgeDegree)
      .withColumn("aa_w",
        when(col("deg") >= 2L,
          round(lit(1.0) / log(col("deg").cast("double")), 6))
          .cast("decimal(8,6)"))
    val adj = m.select(col("v").as("w"), col("u").as("n"))
      .join(centers, Seq("w"))
    val wedges = adj.as("a").join(adj.as("b"),
        col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"), col("a.aa_w").as("aa_w"))
    val scored = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"),
        sum(col("aa_w")).cast("decimal(18,6)").as("aa_score"))
      // link PREDICTION: only absent edges are candidates
      .join(e.select(col("lo").as("u"), col("hi").as("v")),
        Seq("u", "v"), "left_anti")
    scored.orderBy(col("aa_score").desc, col("u"), col("v")).limit(topK)
  }

  /** The full neighborhood-score suite for the top-k candidate
    * non-edges — common neighbors, Jaccard, resource allocation
    * (Zhou, Lü & Zhang 2009: Σ 1/deg(w), the RA index that
    * consistently beats AA on dense graphs), and Adamic–Adar — so a
    * recommender can A/B the four classic indices from ONE wedge
    * expansion instead of four.
    *
    * Same wedge machinery and hub cap as [[adamicAdarTopK]]; both
    * per-neighbor weights (1/ln deg, 1/deg) are 6-dp-rounded DECIMALs
    * summed exactly, Jaccard is exact integer ppm over full degrees,
    * and candidates rank by the EXACT `(n_common DESC, u, v)` key —
    * no float ever decides membership of the top-k.
    *
    * Output: `(u, v, n_common, jaccard_ppm, ra_score, aa_score)`.
    */
  def neighborhoodScoresTopK(edges: DataFrame, srcCol: String,
                             dstCol: String,
                             maxWedgeDegree: Int = 10000,
                             topK: Int = 20): DataFrame = {
    val e = Triangles.canonicalEdges(edges, srcCol, dstCol)
    val m = e.select(col("lo").as("u"), col("hi").as("v"))
      .unionAll(e.select(col("hi").as("u"), col("lo").as("v")))
    val deg = m.groupBy(col("u").as("w")).agg(count(lit(1)).as("deg"))
    // same deg >= 2 guard as [[adamicAdarTopK]] (see the comment there):
    // ln(1) = 0 makes the raw ANSI divide throw under eager projection
    // placement; the guarded form is result-identical (NULL weight on
    // both engines, and a degree-1 center closes no wedge). ra_w's
    // divisor is deg itself (>= 1) — never zero, no guard needed.
    val centers = deg.filter(col("deg") <= maxWedgeDegree)
      .withColumn("aa_w",
        when(col("deg") >= 2L,
          round(lit(1.0) / log(col("deg").cast("double")), 6))
          .cast("decimal(8,6)"))
      .withColumn("ra_w",
        round(lit(1.0) / col("deg").cast("double"), 6)
          .cast("decimal(8,6)"))
    val adj = m.select(col("v").as("w"), col("u").as("n"))
      .join(centers, Seq("w"))
    val wedges = adj.as("a").join(adj.as("b"),
        col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"),
        col("a.aa_w").as("aa_w"), col("a.ra_w").as("ra_w"))
    val scored = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"),
        sum(col("aa_w")).cast("decimal(18,6)").as("aa_score"),
        sum(col("ra_w")).cast("decimal(18,6)").as("ra_score"))
      .join(e.select(col("lo").as("u"), col("hi").as("v")),
        Seq("u", "v"), "left_anti")
      .join(deg.select(col("w").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("w").as("v"), col("deg").as("dv")), Seq("v"))
    scored
      .select(col("u"), col("v"), col("n_common"),
        expr("(1000000 * n_common) DIV (du + dv - n_common)")
          .as("jaccard_ppm"),
        col("ra_score").cast("double").as("ra_score"),
        col("aa_score").cast("double").as("aa_score"))
      .orderBy(col("n_common").desc, col("u"), col("v"))
      .limit(topK)
  }

  /** Item-item cosine top-k: for each item, its `topKPerItem` nearest
    * neighbors by co-occurrence cosine. Inputs are pre-aggregated —
    * `pairCounts(pa, pb, n_both)` with pa < pb (one co-occurrence
    * self-join paid upstream, shareable as an artifact) and
    * `itemCounts(item, n)` — so this stage is two broadcast-size hash
    * joins plus a WindowGroupLimit; it never touches the raw baskets.
    *
    * `cos = round(n_both / sqrt(n_a·n_b), 6)`: integer product under
    * the sqrt (exact in double to 2^52), one IEEE sqrt + divide —
    * engine-portable at 6 dp.
    */
  def itemCosineTopK(pairCounts: DataFrame, itemCounts: DataFrame,
                     topKPerItem: Int = 3, minBoth: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = pairCounts.filter(col("n_both") >= minBoth)
    // mirror so every item sees its full neighbor list
    val both = p.select(col("pa").as("item"), col("pb").as("other"), col("n_both"))
      .unionAll(p.select(col("pb").as("item"), col("pa").as("other"), col("n_both")))
    val scored = both
      .join(itemCounts.select(col("item"), col("n").as("na")), Seq("item"))
      .join(itemCounts.select(col("item").as("other"), col("n").as("nb")),
        Seq("other"))
      .withColumn("cos", round(col("n_both").cast("double") /
        sqrt((col("na") * col("nb")).cast("double")), 6))
    val w = Window.partitionBy("item")
      .orderBy(col("cos").desc, col("other"))
    scored.withColumn("rk", row_number().over(w)) // WindowGroupLimit prunes
      .filter(col("rk") <= topKPerItem)
      .select(col("item"), col("other"), col("n_both"), col("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over a bipartite
    * user→item graph: `rounds` synchronous iterations of
    * auth(p) = Σ hub(u), hub(u) = Σ auth(p), each half-round
    * L1-normalized. Per round: two node-keyed hash joins + two hash
    * aggs — PageRank's cost shape, but with two mutually recursive
    * score vectors (the query-vs-catalog asymmetry PageRank can't
    * express).
    *
    * Normalized scores are rounded to 6 dp and summed in DECIMAL
    * (the q106 discipline) so every intermediate is order-independent
    * and the unrolled SQL replay agrees exactly. Returns the top-k
    * authorities `(item, auth)`.
    */
  def hitsTopAuthorities(userItem: DataFrame, userCol: String,
                         itemCol: String, rounds: Int = 2,
                         topK: Int = 20): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.storage.StorageLevel
    // every round (and each round's normalization) re-walks e's
    // lineage — persist the distinct edge list once; released by the
    // session's Retained.releaseAll
    val e = Retained.track(
      userItem.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("p")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    var hub = e.select(col("u")).distinct()
      .withColumn("h", lit(BigDecimal(1)).cast("decimal(18,6)"))
    var auth: DataFrame = null
    for (_ <- 1 to rounds) {
      val araw = e.join(hub, Seq("u"))
        .groupBy("p").agg(sum(col("h")).cast("decimal(28,6)").as("raw"))
      auth = normalized(araw, "p", "a")
      val hraw = e.join(auth, Seq("p"))
        .groupBy("u").agg(sum(col("a")).cast("decimal(28,6)").as("raw"))
      hub = normalized(hraw, "u", "h")
    }
    auth.select(col("p").as("item"), col("a").cast("double").as("auth"))
      .orderBy(col("auth").desc, col("item")).limit(topK)
  }

  /** L1-normalize `raw` over all rows: round(raw/Σraw, 6) as DECIMAL.
    * The Σ is a broadcast one-row frame, not a window — no single-
    * partition stage. `raw` feeds BOTH the Σ and the per-row divide,
    * so it is persisted (node-sized, released via Retained) — without
    * it every normalization re-runs the half-round's join+agg twice.
    */
  private def normalized(raw: DataFrame, keyCol: String,
                         outCol: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val r = Retained.track(raw.persist(StorageLevel.MEMORY_AND_DISK))
    r.crossJoin(broadcast(
        r.agg(sum(col("raw")).cast("decimal(28,6)").as("tot"))))
      .select(col(keyCol),
        round(col("raw").cast("double") / col("tot").cast("double"), 6)
          .cast("decimal(10,6)").as(outCol))
  }
}
