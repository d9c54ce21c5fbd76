package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics. First resident: degree
  * assortativity (Newman 2002, "Assortative mixing in networks") —
  * the Pearson correlation of end-point degrees over edges, the
  * single scalar that says whether hubs attach to hubs (r > 0) or to
  * leaves (r < 0); a standard sanity gate on graph-structured
  * training data (social graphs are assortative, co-purchase and
  * web graphs typically disassortative).
  *
  * Scale shape: ONE degree hash-agg, two node-key hash joins to
  * decorate each directed end-pair, ONE moment aggregation. With both
  * edge orientations present the x/y marginals coincide, so Pearson
  * reduces to `(m·Σxy − (Σx)²) / (m·Σx² − (Σx)²)` over four exact
  * integer moments — the moments accumulate in DECIMAL headroom
  * picked so no product crosses the 38-digit cap (no precision-loss
  * rescaling), and only the final division is float, rounded 6 dp.
  */
object GraphStats {

  /** One row: `(n_nodes, n_edges, assortativity)` — `n_edges` counts
    * undirected edges once; `assortativity` is NULL for degenerate
    * graphs (every degree equal, e.g. a perfect matching or cycle,
    * where the variance term is 0).
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
    val pairs = e
      .join(deg.select(col("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("d").as("dv")), Seq("v"))
    pairs.agg(
        count(lit(1)).as("m2"), // directed end-pairs = 2·n_edges
        sum(col("du").cast("decimal(18,0)")).as("sx"),
        sum((col("du") * col("dv")).cast("decimal(18,0)")).as("sxy"),
        sum((col("du") * col("du")).cast("decimal(18,0)")).as("sxx"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      // (9,0)·(28,0) → 38 and (18,0)² → 37: no cap crossing anywhere
      .withColumn("__num",
        (col("m2").cast("decimal(9,0)") * col("sxy").cast("decimal(28,0)") -
          col("sx").cast("decimal(18,0)") *
            col("sx").cast("decimal(18,0)")).cast("double"))
      .withColumn("__den",
        (col("m2").cast("decimal(9,0)") * col("sxx").cast("decimal(28,0)") -
          col("sx").cast("decimal(18,0)") *
            col("sx").cast("decimal(18,0)")).cast("double"))
      .select(col("n_nodes"),
        expr("m2 DIV 2").as("n_edges"),
        when(col("__den") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("__num") / col("__den"), 6))
          .as("assortativity"))
  }

  /** Power-law tail exponent of the degree distribution (Newman 2005,
    * "Power laws, Pareto distributions and Zipf's law", eq. 5 — the
    * Hill/MLE estimator): `α = 1 + n / Σ ln(d / (dmin − 0.5))` over
    * nodes with degree ≥ dmin. The scale-free-ness audit for graph
    * corpora (α ∈ [2,3] is the small-world signature; α far outside
    * means the graph generator or join is broken).
    *
    * One degree hash-agg + one aggregation; the ln terms are rounded
    * to 6 dp and summed in DECIMAL (order-independent, the q106
    * discipline), so both engines see the identical sum; α is one
    * float expression on one row, rounded 6 dp.
    */
  def powerLawAlpha(edges: DataFrame, srcCol: String, dstCol: String,
                    dmin: Long): DataFrame = {
    require(dmin >= 1, s"dmin must be >= 1, got $dmin")
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    e.groupBy("u").agg(count(lit(1)).as("d"))
      .filter(col("d") >= dmin)
      .agg(count(lit(1)).as("n_tail"),
        sum(round(log(col("d").cast("double") / lit(dmin - 0.5)), 6)
          .cast("decimal(18,6)")).as("__s"))
      .select(col("n_tail"), lit(dmin).as("dmin"),
        round(lit(1.0) + col("n_tail").cast("double") /
          col("__s").cast("double"), 6).as("alpha"))
  }
}
