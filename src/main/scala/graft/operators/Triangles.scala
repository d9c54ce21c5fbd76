package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale shape: two hash joins on node keys — no global structure,
  * no driver-side graph. The wedge fan-out is Σ deg(v)² over oriented
  * degrees; for skew-heavy graphs the classic refinement is to orient
  * by (degree, id) instead of id, which caps oriented out-degree at
  * O(√m) — the id orientation is kept here because the oracle must
  * reproduce the SAME orientation in portable SQL and the co-purchase
  * graphs this feeds are degree-bounded by construction (≤ 7 parts
  * per order).
  */
object Triangles {

  /** Canonical undirected edge list `(lo, hi)` — deduped, self-loops
    * dropped, both input directions folded.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()

  /** Global triangle count plus graph size: one row
    * `(n_nodes, n_edges, n_triangles)`.
    */
  def census(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val wedges = e.as("ab").join(e.as("ac"),
        col("ab.lo") === col("ac.lo") && col("ab.hi") < col("ac.hi"))
      .select(col("ab.hi").as("lo"), col("ac.hi").as("hi"))
    val tris = wedges.join(e, Seq("lo", "hi"), "left_semi")
    val nodes = e.select(col("lo").as("n"))
      .unionAll(e.select(col("hi").as("n"))).distinct()
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(tris.agg(count(lit(1)).as("n_triangles"))))
  }
}
