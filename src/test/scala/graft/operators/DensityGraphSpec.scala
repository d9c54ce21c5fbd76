package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[NeighborhoodFunction.harmonicTopK]], [[Dbscan]], and
  * [[EpochResample]] against hand computations.
  */
class DensityGraphSpec extends SparkSpec {
  import spark.implicits._

  test("harmonic centrality: exact on a 3-path (sketches below k)") {
    // path 1—2—3: H(2) = 2 (two nodes at distance 1),
    // H(1) = H(3) = 1 + 1/2 = 1.5; k=8 keeps every sketch exact
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = NeighborhoodFunction.harmonicTopK(e, "src", "dst",
      k = 8, rounds = 2, topN = 3).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L, 1L, 3L))
    assert(r(0).getDouble(3) === 2.0)
    assert(r(1).getDouble(3) === 1.5 && r(2).getDouble(3) === 1.5)
  }

  test("DBSCAN: cluster with border, under-dense pair and singleton are noise") {
    // A = {1,2,3} tight triangle (all core), 4 reaches exactly one
    // core (border); {10, 11} are a 2-point pair below minPts=3;
    // 20 is isolated — both noise
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.05, 0.0), (3L, 0.0, 0.05), (4L, 0.0, 0.15),
      (10L, 10.0, 10.0), (11L, 10.05, 10.0), (20L, 20.0, 20.0))
      .toDF("id", "x", "y")
    val r = Dbscan.clusterSummary(pts, "id", "x", "y", eps = 0.1,
      minPts = 3L).collect()
    assert(r.length === 2)
    assert(r(0).getLong(0) === 1L && r(0).getLong(1) === 3L &&
      r(0).getLong(2) === 1L && r(0).getLong(3) === 4L)
    assert(r(1).isNullAt(0) && r(1).getLong(3) === 3L)
  }

  test("DBSCAN: minPts below 2 is refused (isolated points have no pair rows)") {
    val pts = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Dbscan.clusterSummary(pts, "id", "x", "y", 0.1, minPts = 1L)
    }
  }

  test("DBSCAN: two separate clusters get distinct min-id labels") {
    val mk = (base: Long, ox: Double) => Seq(
      (base, ox, 0.0), (base + 1, ox + 0.05, 0.0), (base + 2, ox, 0.05))
    val pts = (mk(1L, 0.0) ++ mk(10L, 5.0)).toDF("id", "x", "y")
    val r = Dbscan.clusterSummary(pts, "id", "x", "y", 0.1, 3L).collect()
    assert(r.map(r0 => if (r0.isNullAt(0)) -1L else r0.getLong(0)).toSeq
      === Seq(1L, 10L, -1L))
    assert(r(0).getLong(3) === 3L && r(1).getLong(3) === 3L &&
      r(2).getLong(3) === 0L)
  }

  test("epoch resample: uniform mix replicates 1:1; skewed mix up-samples rare") {
    // two sources, equal mass/count → r_ppm = 1e6 exactly, every doc
    // emitted exactly once
    val uni = (1L to 10L).map(i =>
      (i, if (i <= 5) "a" else "b", 100L)).toDF("doc_id", "source", "n_chars")
    val ru = EpochResample.replicationRates(uni, "doc_id", "source", "n_chars")
      .orderBy(col("source")).collect()
    assert(ru.forall(_.getLong(5) === 1000000L))
    val ids = EpochResample.resampledIds(uni, "doc_id", "source", "n_chars")
    assert(ids.count() === 10L)
    // 9:1 doc skew at equal per-doc mass: p = (900000, 100000) ppm,
    // isqrt tilt → targets (750000, 250000), rates (833333, 2500000) —
    // the rare source's docs replicate ~2.5×
    val skew = (1L to 10L).map(i =>
      (i, if (i <= 9) "a" else "b", 100L)).toDF("doc_id", "source", "n_chars")
    val rs = EpochResample.replicationRates(skew, "doc_id", "source", "n_chars")
      .orderBy(col("source")).collect()
    assert(rs.map(_.getLong(4)).toSeq === Seq(750000L, 250000L))
    assert(rs.map(_.getLong(5)).toSeq === Seq(833333L, 2500000L))
    // the emission is a pure function of the corpus — rerun identical
    val e1 = EpochResample.resampledIds(skew, "doc_id", "source", "n_chars")
      .orderBy(col("doc_id"), col("copy")).collect().map(_.toSeq).toSeq
    val e2 = EpochResample.resampledIds(skew, "doc_id", "source", "n_chars")
      .orderBy(col("doc_id"), col("copy")).collect().map(_.toSeq).toSeq
    assert(e1 === e2)
    // source b's single doc gets at least floor(2.5) = 2 copies
    assert(e1.count(_.head == 10L) >= 2)
  }
}
