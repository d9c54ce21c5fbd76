package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[Contingency]], [[Spearman]] and [[Ewma]] against hand
  * computations and sequential folds.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("chi-square: independent table scores 0, perfect association V=1") {
    // perfectly independent 2x2: every cell 10
    val ind = (Seq.fill(10)(("A", "1")) ++ Seq.fill(10)(("A", "2")) ++
      Seq.fill(10)(("B", "1")) ++ Seq.fill(10)(("B", "2"))).toDF("x", "y")
    val r1 = Contingency.chiSquareIndependence(ind, "x", "y").collect()(0)
    assert(r1.getLong(0) === 40L && r1.getLong(3) === 1L)
    assert(r1.getDouble(4) === 0.0 && r1.getDouble(5) === 0.0)
    // perfect association incl. ZERO cells: (A,1):10 and (B,2):10 only.
    // chi2 = n = 20 exactly; V = sqrt(20/20) = 1. Dropping the zero
    // cells would halve chi2 — this pins the full-grid fix.
    val dep = (Seq.fill(10)(("A", "1")) ++ Seq.fill(10)(("B", "2")))
      .toDF("x", "y")
    val r2 = Contingency.chiSquareIndependence(dep, "x", "y").collect()(0)
    assert(r2.getDouble(4) === 20.0 && r2.getDouble(5) === 1.0)
    // constant column: dof 0, V null
    val const = Seq(("A", "1"), ("A", "2")).toDF("x", "y")
    val r3 = Contingency.chiSquareIndependence(const, "x", "y").collect()(0)
    assert(r3.getLong(3) === 0L && r3.isNullAt(5))
  }

  test("mutual information: independent=0, perfect association=ln 2") {
    val ind = (Seq.fill(10)(("A", "1")) ++ Seq.fill(10)(("A", "2")) ++
      Seq.fill(10)(("B", "1")) ++ Seq.fill(10)(("B", "2"))).toDF("x", "y")
    val r1 = Contingency.mutualInformation(ind, "x", "y").collect()(0)
    assert(r1.getLong(0) === 40L && r1.getDouble(4) === 0.0)
    // deterministic 2x2: y = f(x) exactly — MI = H(x) = ln 2
    val dep = (Seq.fill(10)(("A", "1")) ++ Seq.fill(10)(("B", "2")))
      .toDF("x", "y")
    val r2 = Contingency.mutualInformation(dep, "x", "y").collect()(0)
    assert(math.abs(r2.getDouble(4) - math.log(2)) < 1e-5)
  }

  test("cohort retention: hand-computed two-cohort curve, exact ppm") {
    // users 1,2,3 first active day 0; user 4 first active day 1.
    // day 0: {1,2,3}; day 1: {1,2,4}; day 2: {1,4}
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (1L, 1L), (2L, 1L),
      (4L, 1L), (1L, 2L), (4L, 2L), (1L, 2L)).toDF("u", "p")
    val got = Retention.cohortRetention(df, "u", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((0L, 0L)) === ((3L, 3L, 1000000L)))
    assert(got((0L, 1L)) === ((2L, 3L, 666666L))) // exact integer DIV
    assert(got((0L, 2L)) === ((1L, 3L, 333333L)))
    assert(got((1L, 0L)) === ((1L, 1L, 1000000L)))
    assert(got((1L, 1L)) === ((1L, 1L, 1000000L)))
    assert(got.size === 5)
  }

  test("spearman: monotone=1, reversed=-1, ties midranked, constant null") {
    val df = Seq(
      // g1: perfectly monotone
      ("g1", 1.0, 10L), ("g1", 2.0, 20L), ("g1", 3.0, 30L),
      // g2: perfectly reversed
      ("g2", 1.0, 30L), ("g2", 2.0, 20L), ("g2", 3.0, 10L),
      // g3: tied x pair [1,1,2] vs y [5,7,9] -> rho = 6/sqrt(48)
      ("g3", 1.0, 5L), ("g3", 1.0, 7L), ("g3", 2.0, 9L),
      // g4: constant x -> null
      ("g4", 7.0, 1L), ("g4", 7.0, 2L)).toDF("g", "x", "y")
    val got = Spearman.correlation(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got("g1") === Some(1.0))
    assert(got("g2") === Some(-1.0))
    assert(got("g3") === Some(0.866025)) // 6/sqrt(48) rounded 6dp
    assert(got("g4") === None)
  }

  test("spearman ranks are per-group (global prefix base subtracted)") {
    // identical data in two groups must give identical rho even though
    // the global (g, v) prefix differs between them
    val df = Seq(("a", 1.0, 3L), ("a", 2.0, 1L), ("a", 3.0, 2L),
      ("b", 1.0, 3L), ("b", 2.0, 1L), ("b", 3.0, 2L)).toDF("g", "x", "y")
    val got = Spearman.correlation(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("a") === got("b") && got("a") === -0.5)
  }

  test("spearman hybrid: long and DECIMAL moment paths are bit-identical") {
    val df = Seq(
      ("g1", 1.0, 10L), ("g1", 2.0, 20L), ("g1", 3.0, 30L),
      ("g3", 1.0, 5L), ("g3", 1.0, 7L), ("g3", 2.0, 9L),
      ("g5", 2.0, 9L), ("g5", 5.0, 1L), ("g5", 3.0, 4L), ("g5", 1.0, 2L))
      .toDF("g", "x", "y")
    def res(maxN: Long) =
      Spearman.correlation(df, "g", "x", "y", longPathMaxN = maxN)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toMap
    // default long path vs forced all-DECIMAL face: exact integers both
    // ways, so results must match to the bit
    assert(res(Spearman.LongPathMaxN) === res(0L))
  }

  test("spearman DECIMAL path: a 1.4e6-row group (past the BIGINT-safe bound)") {
    // 4n³ for n = 1.4e6 exceeds 2^63 — BIGINT moments would silently
    // wrap here; the pre-agg must route this group to the DECIMAL face
    // and still get the exact answer (y = -x ⇒ rho = −1)
    val n = 1400000L
    assert(n > Spearman.LongPathMaxN)
    val big = spark.range(n).selectExpr("'g' AS g", "id AS x", "-id AS y")
    val rows = Spearman.correlation(big, "g", "x", "y").collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === n)
    assert(rows(0).getDouble(2) === -1.0)
  }

  test("KMV overlap: exact in the not-full regime, hand-computed") {
    import graft.operators.Sketches
    val a = (1 to 6).map(i => ("g", i.toString)).toDF("g", "u")
    val b = (4 to 9).map(i => ("g", i.toString)).toDF("g", "u")
    val got = Sketches.kmvOverlapEstimate(
        Sketches.kmvSketch(a, Seq("g"), "u", 16),
        Sketches.kmvSketch(b, Seq("g"), "u", 16), Seq("g"), 16)
      .collect()(0)
    // |A∪B| = 9 < k ⇒ merged sketch holds the whole union: estimates
    // are exact — union 9, both-sides rows = |A∩B| = {4,5,6} = 3,
    // jaccard 3/9 rounded, intersection = round(0.333333 · 9.0, 6)
    assert(got.getLong(1) === 9L)   // n_kept
    assert(got.getLong(2) === 3L)   // n_both
    assert(got.getDouble(3) === 9.0)        // est_union
    assert(got.getDouble(4) === 0.333333)   // jaccard_est
    assert(got.getDouble(5) === 2.999997)   // est_intersection
  }

  test("k-anonymity / l-diversity: hand-computed class histograms") {
    import graft.operators.Anonymity
    // quasi (region, band): classes {(n,1):3 rows, (n,2):1, (s,1):2}
    // sensitive seg: (n,1) spans {a,b}, (n,2) {a}, (s,1) {a}
    val df = Seq(
      ("n", 1L, "a"), ("n", 1L, "a"), ("n", 1L, "b"),
      ("n", 2L, "a"),
      ("s", 1L, "a"), ("s", 1L, "a")).toDF("r", "band", "seg")
    val k = Anonymity.kAnonymityProfile(df, Seq("r", "band"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // size 1: one class (n,2) / 1 row; size 2: (s,1) / 2; size 3: (n,1) / 3
    assert(k.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)))
    val l = Anonymity.lDiversityProfile(df, Seq("r", "band"), "seg")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // diversity 1: (n,2) and (s,1); diversity 2: (n,1)
    assert(l.toSeq === Seq((1L, 2L), (2L, 1L)))
  }

  test("cohen kappa: identity=1, skew-corrected, constant-equal null") {
    // perfect agreement
    val same = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val r1 = Contingency.cohenKappa(same, "a", "b").collect()(0)
    assert(r1.getDouble(2) === 1.0 && r1.getDouble(4) === 1.0)
    // hand case: n=10, diag=7; rows a:(6,4), cols b:(5,5)
    // cells: (x,x)=4,(x,y)=2,(y,y)=3,(y,x)=1 -> po=0.7
    // pe = (6*5 + 4*5)/100 = 0.5 -> kappa = (7*10-50)/(100-50) = 0.4
    val df = (Seq.fill(4)(("x", "x")) ++ Seq.fill(2)(("x", "y")) ++
      Seq.fill(3)(("y", "y")) ++ Seq.fill(1)(("y", "x"))).toDF("a", "b")
    val r2 = Contingency.cohenKappa(df, "a", "b").collect()(0)
    assert(r2.getLong(0) === 10L && r2.getLong(1) === 7L)
    assert(r2.getDouble(2) === 0.7 && r2.getDouble(3) === 0.5)
    assert(r2.getDouble(4) === 0.4)
    // both sides the same constant: pe = 1, kappa undefined -> null
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Contingency.cohenKappa(const, "a", "b").collect()(0).isNullAt(4))
  }

  test("moments: two-point kurtosis -2, hand skew, constant null, guard") {
    val df = Seq(("a", 0L), ("a", 100L), ("b", 0L), ("b", 0L), ("b", 300L),
      ("c", 7L), ("c", 7L)).toDF("g", "cents")
    val got = Moments.shape(df, "g", "cents").collect()
      .map(r => r.getString(0) -> r).toMap
    // symmetric pair: skew 0 (not -0.0), kurtosis exactly -2
    assert(got("a").getDouble(4) === 0.0 && got("a").getDouble(5) === -2.0)
    assert(1.0 / got("a").getDouble(4) > 0) // +0.0, the -0.0 fold works
    // [0,0,300]: m2=2e4, m3=2e6 -> skew = 1/sqrt(2) rounded
    assert(got("b").getDouble(4) === 0.707107)
    // constant group: shape stats undefined
    assert(got("c").isNullAt(4) && got("c").isNullAt(5))
    // out-of-contract magnitude fails fast, not silently
    val big = Seq(("x", 1000000L)).toDF("g", "cents")
    intercept[Exception] {
      Moments.shape(big, "g", "cents").collect()
    }
  }

  test("dyadic EWMA equals the sequential fold; head truncation exact") {
    val df = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 400L),
      (2L, 1L, 50L)).toDF("k", "o", "cents")
    val got = Ewma.dyadicEwma(df, "k", "o", "cents", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // w=3 weights (current->oldest) 4,2,1
    assert(got((1L, 1L)) === 100.0) // only itself: 4*100/4
    assert(got((1L, 2L)) === 166.666667) // (4*200+2*100)/6 rounded 6dp
    assert(got((1L, 3L)) === (4 * 400 + 2 * 200 + 1 * 100.0) / 7)
    assert(got((2L, 1L)) === 50.0) // cross-key isolation
    // window slides: a 4th row drops the 1st
    val df2 = (df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq :+ (1L, 4L, 800L)).toDF("k", "o", "cents")
    val g2 = Ewma.dyadicEwma(df2, "k", "o", "cents", window = 3)
      .filter(col("o") === 4).collect()(0).getDouble(3)
    assert(g2 === (4 * 800 + 2 * 400 + 1 * 200.0) / 7)
  }

  test("dyadic EWMA: NULL current value yields NULL ewma; history still counts") {
    // matches the SQL oracle's bare `cents * w` i=0 term: a missing
    // observation has no smoothed value of its own; as HISTORY it is
    // skipped (the NULL lag coalesces to 0 and its weight leaves the
    // denominator), so later rows renormalize over what is present.
    val df = Seq[(Long, Long, java.lang.Long)](
      (1L, 1L, 100L), (1L, 2L, null), (1L, 3L, 400L))
      .toDF("k", "o", "cents")
    val got = Ewma.dyadicEwma(df, "k", "o", "cents", window = 3)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) === Some(100.0))
    assert(got(2L) === None) // NULL current -> NULL ewma (oracle parity)
    // row 3: current 400 (w=4) + lag1 NULL (skipped) + lag2 100 (w=1)
    assert(got(3L) === Some((4 * 400 + 1 * 100.0) / 5))
  }
}
