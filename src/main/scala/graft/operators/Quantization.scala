package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 embedding quantization + quantized similarity search — the
  * standard memory/bandwidth lever for vector search at corpus scale:
  * a 64-dim float32 embedding (256 B) becomes 64 bytes, and the dot
  * product becomes exact integer arithmetic (engine-invariant, unlike
  * float sums which depend on reduction order).
  *
  * Calibration is per-dimension min/max over the corpus — a single
  * hash aggregation producing one dim-sized row that broadcasts to the
  * quantization pass (per-dim stats are metadata: 64 doubles, never a
  * driver-side loop over data).
  */
object Quantization {

  /** Per-dimension (1-based dim, mn, mx) calibration stats. */
  def calibrate(embeddings: DataFrame, vecCol: String): DataFrame =
    embeddings.select(posexplode(col(vecCol)).as(Seq("d0", "x")))
      .select((col("d0") + 1).as("dim"), col("x").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Rows of (idCol, qvec) where qvec[i] = floor((x-mn)/(mx-mn)*255)
    * in 0..255 (constant dims map to 0). The double arithmetic is a
    * fixed op sequence, so every engine lands the same integer.
    */
  def quantize(embeddings: DataFrame, idCol: String, vecCol: String,
               calib: DataFrame): DataFrame = {
    val mins = calib.groupBy().agg(
      array_sort(collect_list(struct(col("dim"), col("mn")))).as("s1"),
      array_sort(collect_list(struct(col("dim"), col("mx")))).as("s2"))
      .select(transform(col("s1"), e => e("mn")).as("mns"),
        transform(col("s2"), e => e("mx")).as("mxs"))
    embeddings.select(col(idCol), col(vecCol).as("v"))
      .crossJoin(broadcast(mins))
      .select(col(idCol),
        transform(col("v"), (x, i) => {
          val mn = get(col("mns"), i)
          val mx = get(col("mxs"), i)
          when(mx === mn, lit(0L)).otherwise(
            floor((x.cast("double") - mn) / (mx - mn) * 255))
        }).as("qvec"))
  }

  /** Exact integer dot product of two int vectors. */
  def qdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
}
