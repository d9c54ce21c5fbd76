package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[Silhouette]] and [[RandomProjection]] against hand geometry
  * and algebraic invariants.
  */
class EmbeddingEvalSpec extends SparkSpec {
  import spark.implicits._

  test("silhouette: two tight separated clusters score the hand value") {
    // A at x=0 (y 0/2), B at x=10 (y 0/2): centroids (0,1) and (10,1);
    // every point has a=1, b=sqrt(101) -> s = 1 - 1/sqrt(101)
    val df = Seq(
      (1L, 0, Array(0f, 0f)), (2L, 0, Array(0f, 2f)),
      (3L, 1, Array(10f, 0f)), (4L, 1, Array(10f, 2f)))
      .toDF("vec_id", "label", "embedding")
    val got = Silhouette.byLabelCentroids(df, "vec_id", "label", "embedding")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0) === ((2L, 0.900496)) && got(1) === ((2L, 0.900496)))
    // single label: b undefined for every point -> empty mean (null)
    val one = Seq((1L, 0, Array(0f, 0f)), (2L, 0, Array(1f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val r1 = Silhouette.byLabelCentroids(one, "vec_id", "label", "embedding")
      .collect()(0)
    assert(r1.getLong(1) === 0L && r1.isNullAt(2))
  }

  test("JL projection: deterministic, linear, full fan-out") {
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(2f, 4f, 6f)))
      .toDF("vec_id", "embedding")
    val p = RandomProjection.projectSigned(df, "vec_id", "embedding", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getDecimal(2).doubleValue()).toMap
    assert(p.size === 16) // 2 ids x 8 out-dims
    // signs are data-independent: vec 2 = 2*vec 1 => proj 2 = 2*proj 1
    (1 to 8).foreach { j =>
      assert(p((2L, j)) === 2.0 * p((1L, j)), s"pdim $j not linear")
    }
    // re-projection is bit-identical (md5 signs, no RNG state)
    val again = RandomProjection.projectSigned(df, "vec_id", "embedding", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getDecimal(2).doubleValue()).toMap
    assert(again === p)
  }
}
