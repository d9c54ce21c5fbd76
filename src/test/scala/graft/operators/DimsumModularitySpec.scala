package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[Dimsum]], [[LabelPropagation.modularity]],
  * [[Matching.stratifiedAte]], and [[ExperimentMetrics.mdeCheck]]
  * against hand computations.
  */
class DimsumModularitySpec extends SparkSpec {
  import spark.implicits._

  test("DIMSUM: keep-all regime is exact; sampling is deterministic") {
    val baskets = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c")).toDF("bk", "it")
    // γ=50 ≫ √(n_i·n_j): p = 1 everywhere → estimate ≡ exact
    val r = Dimsum.cosineTopK(baskets, "bk", "it", gamma = 50.0, topN = 10)
      .collect()
    assert(r.length === 3)
    assert(r.forall(row => row.getDouble(6) === row.getDouble(7)))
    val ab = r.find(row => row.getString(0) == "a" && row.getString(1) == "b").get
    assert(ab.getLong(4) === 2L &&
      math.abs(ab.getDouble(7) - 2.0 / math.sqrt(6.0)) < 1e-6)
    // γ small: sampled counts bounded by the true counts and replayable
    val s1 = Dimsum.cosineTopK(baskets, "bk", "it", 0.5, 10).collect()
    val s2 = Dimsum.cosineTopK(baskets, "bk", "it", 0.5, 10).collect()
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
    assert(s1.forall(row => row.getLong(5) <= row.getLong(4)))
  }

  test("modularity: two disjoint triangles score exactly 0.5") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val labels = LabelPropagation.communities(e, "src", "dst", rounds = 5)
      .select(col("node"), col("community"))
    val r = LabelPropagation.modularity(e, "src", "dst", labels,
      "node", "community").collect()(0)
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L &&
      r.getLong(2) === 6L)
    assert(r.getDouble(3) === 0.5)
  }

  test("stratified ATE: weighted gap average vs the confounded naive") {
    // X: t=[10] c=[6,6,6] gap 4 (size 4); Y: t=[20,20,20] c=[18] gap 2
    // (size 4) → ATE = 3; naive pooled = 17.5 − 9 = 8.5; stratum Z has
    // treated only → off the common support
    val rows = Seq(
      (true, "X", 10L), (false, "X", 6L), (false, "X", 6L), (false, "X", 6L),
      (true, "Y", 20L), (true, "Y", 20L), (true, "Y", 20L), (false, "Y", 18L),
      (true, "Z", 99L)).toDF("t", "b", "y")
    val r = Matching.stratifiedAte(rows, "t", "b", "y").collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    // naive over ALL rows includes Z's treated 99:
    // mean_t = (10+60+99)/5 = 33.8, mean_c = 36/4 = 9 → 24.8
    assert(r.getDouble(4) === 24.8)
    assert(r.getDouble(5) === 3.0)
  }

  test("MDE: textbook pooled-variance case") {
    val df = Seq((true, 0L), (true, 200L), (false, 100L), (false, 300L))
      .toDF("arm", "y")
    val r = ExperimentMetrics.mdeCheck(df, "arm", "y").collect()(0)
    val sp = math.sqrt(20000.0)
    val mde = (1.959964 + 0.8416212335729143) * math.sqrt(20000.0 * 1.0)
    assert(math.abs(r.getDouble(2) - sp) < 1e-6)
    assert(math.abs(r.getDouble(3) - mde) < 1e-6)
    assert(math.abs(r.getDouble(4) - mde / 150.0) < 1e-6)
  }
}
