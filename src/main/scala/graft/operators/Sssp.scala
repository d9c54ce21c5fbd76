package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single/multi-source weighted shortest paths —
  * distributed Bellman–Ford relaxation: each round joins the current
  * distance frontier with the edge list and keeps the per-node MIN.
  * The weighted complement of [[Bfs]] (hop counts): "how cheaply is
  * this node reached from the seed set", the proximity feature for
  * recommendation / influence radii on the co-purchase graph.
  *
  * Scale shape: per round ONE node-keyed equi-join + ONE min hash agg
  * (min is map-side partial, so the shuffle carries one row per node).
  * The distance frame stays sparse (only reached nodes). Rounds are
  * bounded — at round r every ≤r-edge path is exact, the standard
  * bounded-diameter contract (same as [[Bfs.reachable]]'s maxHops).
  *
  * Exactness: weights are 6-dp DECIMALs and distance = Σ weights
  * stays DECIMAL end to end — min() over exact decimals is
  * order-independent, so the unrolled SQL replay agrees exactly.
  */
object Sssp {

  /** `(node, dist)` for every node reachable from `seeds` within
    * `rounds` edges; `dist` = minimal Σ of `weightCol` (DECIMAL(12,6)).
    * Edges are treated as directed — mirror upstream for undirected
    * graphs.
    */
  def boundedShortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                           weightCol: String, seeds: DataFrame,
                           rounds: Int = 4): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"),
      col(weightCol).cast("decimal(12,6)").as("w"))
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(BigDecimal(0)).cast("decimal(12,6)"))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, dist("node") === e("u"))
        .select(col("v").as("node"),
          (col("dist") + col("w")).cast("decimal(12,6)").as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
    }
    dist
  }
}
