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
}
