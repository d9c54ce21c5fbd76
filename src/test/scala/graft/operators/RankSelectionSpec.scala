package graft.operators

import graft.SparkSpec

/** Pins [[ExactSelection]] against brute-force sorts (including a
  * forced multi-level drill) and [[Kendall]] against hand-counted
  * concordances.
  */
class RankSelectionSpec extends SparkSpec {
  import spark.implicits._

  private def brute(xs: Seq[Long], qs: Seq[Double]): Seq[(Double, Long, Long, Long)] = {
    val sorted = xs.sorted
    val n = xs.size.toLong
    qs.map { q =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      (q, k, sorted((k - 1).toInt), n)
    }
  }

  test("quantilesDisc matches a brute-force sort, ties and negatives included") {
    val xs: Seq[Long] = Seq(5, -3, 7, 7, 7, 0, -3, 12, 100, -50, 7, 5)
    val qs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val got = ExactSelection.quantilesDisc(xs.toDF("v"), "v", qs)
      .as[(Double, Long, Long, Long)].collect().toSeq
    assert(got === brute(xs, qs))
  }

  test("quantilesDisc drills multiple histogram levels when the domain is wide") {
    // maxBuckets=4 forces ceil(log4(range)) ≈ 5 drill rounds on a
    // 1..1000 domain — every round must preserve the residual rank
    val xs: Seq[Long] = (1L to 1000L).map(i => (i * 37) % 1009)
    val qs = Seq(0.25, 0.5, 0.75)
    val got = ExactSelection.quantilesDisc(xs.toDF("v"), "v", qs,
        maxBuckets = 4)
      .as[(Double, Long, Long, Long)].collect().toSeq
    assert(got === brute(xs, qs))
  }

  test("quantilesDisc ignores NULLs and returns nothing on all-NULL input") {
    val withNulls = Seq(Some(10L), None, Some(20L), None, Some(30L))
      .toDF("v")
    val got = ExactSelection.quantilesDisc(withNulls, "v", Seq(0.5))
      .as[(Double, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0.5, 2L, 20L, 3L)))
    val empty = Seq.empty[Option[Long]].toDF("v")
    assert(ExactSelection.quantilesDisc(empty, "v", Seq(0.5)).count() === 0L)
  }

  test("quantilesDisc is exact under heavy skew (one value dominating)") {
    val xs: Seq[Long] = Seq.fill(10000)(42L) ++ Seq(1L, 999999999L)
    val got = ExactSelection.quantilesDisc(xs.toDF("v"), "v",
        Seq(0.0001, 0.5, 1.0), maxBuckets = 16)
      .as[(Double, Long, Long, Long)].collect().toSeq
    assert(got === brute(xs, Seq(0.0001, 0.5, 1.0)))
  }

  test("tauB: hand-counted pairs with ties, and NULL on a constant side") {
    // series g: x = 1,2,2,3  y = 10,30,20,20 over t = 1..4
    // pairs (6): (1,2)C, (1,3)C, (1,4)C; (2,3) x tied → tied_x;
    //   (2,4) x 2<3 but y 30>20 → D; (3,4) y tied → tied_y.
    // C=3, D=1, T_x=1, T_y=1, n0=6
    // tau_b = (3−1) / sqrt(5·5) = 0.4
    val df = Seq(
      ("g", 1L, 1L, 10L), ("g", 2L, 2L, 30L),
      ("g", 3L, 2L, 20L), ("g", 4L, 3L, 20L),
      ("c", 1L, 5L, 1L), ("c", 2L, 5L, 2L), ("c", 3L, 5L, 3L))
      .toDF("k", "t", "x", "y")
    val got = Kendall.tauB(df, Seq("k"), "t", "x", "y")
      .orderBy("k")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("c", 3L, 0L, 0L, 3L, 0L, None), // x constant → every pair tied_x
      ("g", 4L, 3L, 1L, 1L, 1L, Some(0.4))))
  }

  test("tauB: perfect agreement and perfect reversal hit ±1 exactly") {
    val up = (1L to 10L).map(t => ("u", t, t, t * 7))
    val down = (1L to 10L).map(t => ("d", t, t, 100L - t))
    val got = Kendall.tauB((up ++ down).toDF("k", "t", "x", "y"),
        Seq("k"), "t", "x", "y")
      .orderBy("k")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("d", 10L, 0L, 45L, 0L, 0L, Some(-1.0)),
      ("u", 10L, 45L, 0L, 0L, 0L, Some(1.0))))
  }
}
