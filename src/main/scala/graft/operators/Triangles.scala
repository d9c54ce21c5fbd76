package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected graph — the
  * compact-forward / edge-orientation algorithm (Schank & Wagner,
  * "Finding, counting and listing all triangles in large graphs",
  * WEA'05): orient every edge from its lower to its higher endpoint,
  * join the oriented list with itself on the source to enumerate each
  * wedge (a→b, a→c with b < c) exactly once, then keep wedges whose
  * closing edge (b→c) exists via a semi join. Every triangle is
  * counted exactly once, at its minimum vertex.
  *
  * Scale shape: hash joins on node keys — no global structure, no
  * driver-side graph. Orientation is by (degree, id) rank, which caps
  * oriented out-degree at O(√m) and therefore the wedge fan-out at
  * O(m^1.5) even on skewed graphs (the paper's bound); the triangle
  * COUNT is orientation-independent, so a portable oracle may verify
  * with the simpler id orientation and must agree.
  */
object Triangles {

  /** Canonical undirected edge list `(lo, hi)` — deduped, self-loops
    * dropped, both input directions folded.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame =
    // long-normalized up front: packed() below shifts by 32, and on an
    // IntegerType column shiftleft(_, 32) is a silent no-op (Java masks
    // the shift amount), which would collide keys instead of packing
    edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("lo"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()

  /** Global triangle count plus graph size: one row
    * `(n_nodes, n_edges, n_triangles)`.
    */
  def census(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e.select(col("lo").as("n"))
      .unionAll(e.select(col("hi").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // orient each edge toward the (degree, id)-larger endpoint: every
    // triangle then has exactly ONE vertex with both out-edges, and
    // oriented out-degree is O(sqrt m), bounding the wedge join
    val o = e
      .join(deg.select(col("n").as("lo"), col("deg").as("dl")), "lo")
      .join(deg.select(col("n").as("hi"), col("deg").as("dh")), "hi")
      .select(
        when(col("dl") < col("dh") ||
            (col("dl") === col("dh") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("u"),
        when(col("dl") < col("dh") ||
            (col("dl") === col("dh") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("v"))
    // closing-edge lookup on a single packed long: one-word hash keys,
    // and the ~|E|-row build side stays AQE-broadcastable far longer
    // than a two-column struct. Packing needs ids in [0, 2^32) — the
    // assert_true fails fast (codegen'd scan-stage check) if not.
    def packed(a: Column, b: Column): Column = {
      val ok = a >= 0 && b >= 0 && a < (1L << 32) && b < (1L << 32)
      when(assert_true(ok, lit("Triangles.census: node ids must fit 32 bits"))
        .isNull, shiftleft(a, 32).bitwiseOR(b))
    }
    val wedges = o.as("ab").join(o.as("ac"),
        col("ab.u") === col("ac.u") && col("ab.v") < col("ac.v"))
      .select(packed(col("ab.v"), col("ac.v")).as("ek"))
    val tris = wedges.join(
      e.select(packed(col("lo"), col("hi")).as("ek")), Seq("ek"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(tris.agg(count(lit(1)).as("n_triangles"))))
  }

  /** Per-node triangle participation and local clustering coefficient:
    * `(node, deg, n_triangles, clustering_ppm)` for every node, where
    * `clustering_ppm = ⌊2·T·10⁶ / (deg·(deg−1))⌋` (Watts–Strogatz
    * local coefficient as an exact parts-per-million integer; 0 for
    * degree < 2). Same oriented wedge join as [[census]] — each
    * triangle is ENUMERATED once at its orientation apex (an inner
    * join on the packed closing-edge key instead of the count's semi
    * join), then credited to all three corners through one 3-struct
    * explode and counted in a hash aggregation. The ppm division runs
    * in DECIMAL(38,0) so warehouse-scale degrees cannot overflow the
    * 10⁶-scaled numerator.
    */
  def perNodeCensus(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e.select(col("lo").as("n"))
      .unionAll(e.select(col("hi").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val o = e
      .join(deg.select(col("n").as("lo"), col("deg").as("dl")), "lo")
      .join(deg.select(col("n").as("hi"), col("deg").as("dh")), "hi")
      .select(
        when(col("dl") < col("dh") ||
            (col("dl") === col("dh") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("u"),
        when(col("dl") < col("dh") ||
            (col("dl") === col("dh") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("v"))
    def packed(a: Column, b: Column): Column = {
      val ok = a >= 0 && b >= 0 && a < (1L << 32) && b < (1L << 32)
      when(assert_true(ok, lit("Triangles.perNodeCensus: node ids must fit 32 bits"))
        .isNull, shiftleft(a, 32).bitwiseOR(b))
    }
    val wedges = o.as("ab").join(o.as("ac"),
        col("ab.u") === col("ac.u") && col("ab.v") < col("ac.v"))
      .select(col("ab.u").as("u"), col("ab.v").as("v"), col("ac.v").as("w"),
        packed(col("ab.v"), col("ac.v")).as("ek"))
    val tris = wedges.join(
        e.select(packed(col("lo"), col("hi")).as("ek")), Seq("ek"), "left_semi")
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("n").as("node"), col("deg"))
      .join(tris, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("clustering_ppm",
        when(col("deg") >= 2,
          expr("CAST((CAST(2000000 AS DECIMAL(38,0)) * n_triangles)" +
            " div (CAST(deg AS DECIMAL(38,0)) * (deg - 1)) AS BIGINT)"))
          .otherwise(lit(0L)))
  }
}
