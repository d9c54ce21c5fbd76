package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007, "Near linear time algorithm to detect community structures in
  * large-scale networks") — the lightweight community layer between
  * connected components (pure reachability) and modularity methods the
  * cluster can't afford: labels start as node ids and each round every
  * node adopts the most frequent label among its NEIGHBORS, ties to the
  * smallest label, for a FIXED number of rounds.
  *
  * Determinism contract: synchronous updates + (count desc, label asc)
  * tie-break make every round a pure function of the previous labeling,
  * so any engine reproduces the labeling bit-for-bit — the fixed round
  * count trades convergence detection (an extra pass per round, and
  * sync LPA can oscillate on bipartite structures) for a reproducible,
  * oracle-checkable result, the same trade PageRank.ranks makes.
  *
  * Scale shape: one round = one equi-join (labels onto edge sources,
  * node-sized build side) + two hash aggregations (neighbor-label
  * counts, per-node arg-max via a single `min(struct)` — no window, no
  * driver-side graph). The O(edges) side is checkpointed once with the
  * mirrored orientation and never re-shuffles; per-round shuffle volume
  * is O(edges) label rows, exactly PageRank's iteration cost.
  */
object LabelPropagation {

  /** (node, community, community_size) after `rounds` synchronous
    * rounds over the UNDIRECTED edge list (each input row (a, b) is
    * mirrored; duplicate rows are dropped). Nodes with no edge do not
    * appear — singletons are the complement, same contract as
    * [[ConnectedComponents]].
    */
  def communities(edges: DataFrame, srcCol: String, dstCol: String,
                  rounds: Int = 5): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // self-loops dropped: a node voting for its own label would damp
    // every update toward the identity labeling
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    // mirror once, checkpoint: every round joins labels onto THIS frame
    val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      // node <- arg-max over neighbor-label counts; min(struct(-count,
      // label)) is ONE hash aggregation (count desc then label asc),
      // where a row_number window would shuffle-sort per node
      labels = e.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("node"), col("m.label").as("label"))
        .localCheckpoint(true)
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("node"), col("label").as("community"), col("community_size"))
  }
}
