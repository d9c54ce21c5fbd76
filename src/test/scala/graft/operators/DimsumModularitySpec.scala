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

  test("log-rank: identical groups score 0; separated hazards don't") {
    // symmetric arms → O1 = E1 exactly → chi2 = 0
    val same = Seq((true, 1L, true), (true, 2L, true),
      (false, 1L, true), (false, 2L, true)).toDF("g", "t", "e")
    val r0 = SurvivalTests.logRank(same, "g", "t", "e").collect()(0)
    assert(r0.getDouble(6) === 0.0)
    // group A churns at t=1,2; B at t=3,4 — hand tables give
    // O1 = 2, E1 = 0.5 + 1/3 + 0, V = 0.25 + 2/9 + 0
    val sep = Seq((true, 1L, true), (true, 2L, true),
      (false, 3L, true), (false, 4L, true)).toDF("g", "t", "e")
    val r = SurvivalTests.logRank(sep, "g", "t", "e").collect()(0)
    assert(r.getLong(3) === 2L)
    assert(r.getDouble(4) === 0.833333 && r.getDouble(5) === 0.472222)
    assert(math.abs(r.getDouble(6) -
      math.pow(2.0 - 0.833333, 2) / 0.472222) < 1e-5)
    // a censored row leaves the risk set without counting as an event
    val cens = Seq((true, 1L, true), (true, 2L, false),
      (false, 1L, true), (false, 2L, false)).toDF("g", "t", "e")
    val rc = SurvivalTests.logRank(cens, "g", "t", "e").collect()(0)
    assert(rc.getLong(3) === 1L && rc.getDouble(6) === 0.0)
  }

  test("dispersion index: constant counts pass, a burst flags") {
    val flat = Seq(5L, 5L, 5L, 5L).toDF("x")
    val r0 = ExperimentMetrics.dispersionIndex(flat, "x").collect()(0)
    assert(r0.getDouble(2) === 0.0 && !r0.getBoolean(4))
    // [1,1,1,100]: D = 7350.75/25.75 = 285.466019 — wildly Poisson-
    // incompatible
    val burst = Seq(1L, 1L, 1L, 100L).toDF("x")
    val r = ExperimentMetrics.dispersionIndex(burst, "x").collect()(0)
    assert(r.getDouble(2) === 285.466019 && r.getBoolean(4))
  }

  test("jackknife ratio: constant data collapses to zero SE; empty denominators drop") {
    // every unit (10, 2): every leave-one-out ratio is exactly 5
    val const = (1L to 20L).map(_ => (10L, 2L)).toDF("x", "y")
    val r = ExperimentMetrics.ratioJackknifeCi(const, "x", "y").collect()(0)
    assert(r.getLong(0) === 20L && r.getLong(1) === 20L)
    assert(r.getDouble(2) === 5.0 && r.getDouble(3) === 0.0 &&
      r.getDouble(4) === 5.0 && r.getDouble(5) === 5.0)
    // removing the only contributing denominator empties it → that
    // unit drops from the jackknife; n_jk = 1 → SE null
    val thin = Seq((5L, 3L), (7L, 0L)).toDF("x", "y")
    val rt = ExperimentMetrics.ratioJackknifeCi(thin, "x", "y").collect()(0)
    assert(rt.getLong(0) === 2L && rt.getLong(1) === 1L && rt.isNullAt(3))
    // varied data: positive SE, CI brackets the point estimate
    val varied = (1L to 100L).map(i => (i % 30L * 10L, 1L + i % 3L))
      .toDF("x", "y")
    val rv = ExperimentMetrics.ratioJackknifeCi(varied, "x", "y").collect()(0)
    assert(rv.getDouble(3) > 0.0 &&
      rv.getDouble(4) < rv.getDouble(2) && rv.getDouble(2) < rv.getDouble(5))
  }

  test("Mantel-Haenszel OR: hand-computed two-stratum pooling") {
    // S1 balanced (OR 1, ad/n = bc/n = 2.5); S2 a=20 b=10 c=10 d=20
    // (ad/n = 6.666667, bc/n = 1.666667) → OR_MH = 9.166667/4.166667
    def cell(st: String, e: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((st, e, o))
    val rows = (cell("S1", true, true, 10) ++ cell("S1", true, false, 10) ++
      cell("S1", false, true, 10) ++ cell("S1", false, false, 10) ++
      cell("S2", true, true, 20) ++ cell("S2", true, false, 10) ++
      cell("S2", false, true, 10) ++ cell("S2", false, false, 20))
      .toDF("st", "e", "o")
    val r = Matching.mantelHaenszelOr(rows, "st", "e", "o").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 9.166667 && r.getDouble(3) === 4.166667)
    assert(r.getDouble(4) === 2.2)
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
