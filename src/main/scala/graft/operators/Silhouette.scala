package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simplified (centroid-based) silhouette score — the clustering-
  * quality readout: s(i) = (b−a)/max(a,b) with a = distance to the
  * own-cluster centroid and b = the nearest other centroid
  * (Rousseeuw 1987's silhouette with centroids standing in for
  * mean pairwise distances — the O(n·k·d) form that scales, vs the
  * O(n²·d) exact one). The per-label mean flags incoherent clusters
  * (≈0: overlapping; <0: mis-assigned mass).
  *
  * Scale shape: explode to (vec, dim) once; centroids are ONE hash
  * agg over it; distances are ONE dim-keyed join against the k·d
  * centroid frame (replication factor k, the algorithm's intrinsic
  * cost) + a hash agg back to (vec, label). No windows, no driver
  * loops, no n² stage.
  *
  * Exactness: components quantize to DECIMAL(12,6); centroid =
  * round(Σ/n, 6); squared distances accumulate as exact
  * DECIMAL(27,12) products. Only sqrt and the final ratio are float
  * (IEEE-deterministic), rounded 6 dp.
  */
object Silhouette {

  /** `(label, n_vecs, mean_silhouette)` per label over
    * `(idCol, labelCol, vecCol: array<float|double>)`. Vectors whose
    * graph has only one label yield NULL b and drop from the mean
    * (count(s) semantics).
    */
  def byLabelCentroids(df: DataFrame, idCol: String, labelCol: String,
                       vecCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("vid"), col(labelCol).as("own"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("xd", col("x").cast("double").cast("decimal(12,6)"))
    val cent = ex.groupBy(col("own").as("clabel"), col("dim"))
      .agg(count(lit(1)).as("nc"),
        sum(col("xd")).cast("decimal(30,6)").as("sx"))
      .select(col("clabel"), col("dim"),
        round(col("sx").cast("double") / col("nc").cast("double"), 6)
          .cast("decimal(12,6)").as("c"))
    val d2 = ex.join(cent, Seq("dim"))
      .groupBy("vid", "own", "clabel")
      .agg(sum(((col("xd") - col("c")) * (col("xd") - col("c")))
        .cast("decimal(27,12)")).cast("decimal(32,12)").as("d2"))
    val ab = d2.groupBy("vid", "own")
      .agg(max(when(col("clabel") === col("own"), col("d2"))).as("a2"),
        min(when(col("clabel") =!= col("own"), col("d2"))).as("b2"))
    val sa = sqrt(col("a2").cast("double"))
    val sb = sqrt(col("b2").cast("double"))
    val sil = ab.withColumn("s",
      when(col("b2").isNull, lit(null).cast("decimal(10,6)"))
        .when(greatest(sa, sb) === 0.0, lit(0).cast("decimal(10,6)"))
        .otherwise(round((sb - sa) / greatest(sa, sb), 6)
          .cast("decimal(10,6)")))
    sil.groupBy(col("own").as("label"))
      .agg(count(col("s")).as("n_vecs"),
        sum(col("s")).cast("decimal(18,6)").as("ss"))
      .select(col("label"), col("n_vecs"),
        (round(col("ss").cast("double") / col("n_vecs").cast("double"), 6)
          + lit(0.0)).as("mean_silhouette"))
  }
}
