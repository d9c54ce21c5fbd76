package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss signed random projection (Achlioptas 2003,
  * "Database-friendly random projections": ±1 entries suffice) — the
  * cheap dimensionality reducer for embedding pipelines: project
  * d-dim vectors to k ≪ d dims, pay k/d of every downstream
  * distance computation, keep pairwise geometry to within the JL
  * distortion bound. Signs are md5-derived from (out-dim, in-dim) —
  * deterministic, engine-portable, no stored projection matrix.
  *
  * Scale shape: ONE explode to (row, in-dim), ONE k-way replication
  * join against the generated sign frame (k·d rows, broadcast), ONE
  * hash agg back to (row, out-dim). Components stay DECIMAL — the
  * projection is an exact signed sum of quantized inputs.
  */
object RandomProjection {

  /** Long-format projection `(id, pdim ∈ 1..outDims, p)` of
    * `(idCol, vecCol: array<float|double>)`; `p` is DECIMAL(14,6) —
    * the exact ± sum of the 6-dp-quantized components.
    */
  def projectSigned(df: DataFrame, idCol: String, vecCol: String,
                    outDims: Int = 16): DataFrame = {
    require(outDims >= 1 && outDims <= 256, s"outDims out of range: $outDims")
    val spark = df.sparkSession
    import spark.implicits._
    val ex = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim0", "x")))
      // 1-based input dim: SQL replays index arrays 1-based
      .select(col("id"), (col("dim0") + 1).as("indim"),
        col("x").cast("double").cast("decimal(12,6)").as("xd"))
    val pdims = (1 to outDims).toDF("pdim")
    // sign(j, d) = parity of the first hex nibble of md5("j:d")
    val signed = ex.crossJoin(broadcast(pdims))
      .withColumn("par",
        conv(substring(md5(concat(col("pdim").cast("string"), lit(":"),
          col("indim").cast("string"))), 1, 1), 16, 10).cast("long") % 2)
      .select(col("id"), col("pdim"),
        when(col("par") === 0L, col("xd")).otherwise(-col("xd")).as("t"))
    signed.groupBy("id", "pdim")
      .agg(sum(col("t")).cast("decimal(14,6)").as("p"))
  }
}
