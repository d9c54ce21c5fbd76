package graft.operators

import graft.SparkSpec

/** Pins [[RankTests]] against hand-ranked examples: midrank ties,
  * zero-difference dropping, and the tie-corrected statistics.
  */
class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  test("signedRank: hand diffs with a tie and a dropped zero") {
    // pairs (before, after): diffs +1, −2, +3, +3, −4 and one 0 (drops)
    // |d| ranks: 1→1, 2→2, 3→3.5 (t=2), 4→5
    // W+ = 1 + 3.5 + 3.5 = 8 (×2 = 16), W− = 2 + 5 = 7 (×2 = 14)
    // tie3 = 2³−2 = 6; var = 5·6·11/24 − 6/48 = 13.625
    // z = (8 − 30/4)/sqrt(13.625) = 0.5/sqrt(13.625)
    val df = Seq((10L, 11L), (10L, 8L), (0L, 3L), (7L, 10L),
      (20L, 16L), (5L, 5L)).toDF("before", "after")
    val got = RankTests.signedRank(df, "before", "after")
      .as[(Long, Long, Long, Option[Double])].head()
    val expZ = BigDecimal(0.5 / math.sqrt(13.625))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === ((5L, 16L, 14L, Some(expZ))))
  }

  test("signedRank: all-zero diffs yield n=0 and NULL z") {
    val df = Seq((3L, 3L), (9L, 9L)).toDF("before", "after")
    val got = RankTests.signedRank(df, "before", "after")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(got === ((0L, 0L, 0L, None)))
  }

  test("kruskalWallis: tie-free hand groups") {
    // A = {1,2}, B = {3,4}: ranks 1..4; R_A×2 = 6, R_B×2 = 14
    // H = 12/20 · (4.5 + 24.5) − 15 = 2.4; no ties → H' = H
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("g", "v")
    val got = RankTests.kruskalWallis(df, "g", "v")
      .as[(String, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("A", 2L, 6L, 4L, 2.4, Some(2.4)),
      ("B", 2L, 14L, 4L, 2.4, Some(2.4))))
  }

  test("kruskalWallis: midrank ties raise the corrected H") {
    // A = {1,1}, B = {2,2}: mids 1.5, 3.5 → same rank sums as above;
    // tie3 = 6 + 6 = 12, C = 1 − 12/60 = 0.8 → H' = 2.4/0.8 = 3.0
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L))
      .toDF("g", "v")
    val got = RankTests.kruskalWallis(df, "g", "v")
      .as[(String, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("A", 2L, 6L, 4L, 2.4, Some(3.0)),
      ("B", 2L, 14L, 4L, 2.4, Some(3.0))))
  }

  test("friedman: hand blocks — consistent ordering maximizes chi2") {
    // 3 complete blocks, treatments A<B<C in every block → within-
    // block ranks always 1,2,3; R×2 = 6, 12, 18; Σ(2R)² = 36+144+324
    // = 504; χ² = 3·504/(3·3·4) − 3·3·4 = 42 − 36 = 6 (max for n=3,k=3)
    // block 4 is incomplete (no C) and must be dropped
    val df = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "A", 5L), (2L, "B", 6L), (2L, "C", 7L),
      (3L, "A", 100L), (3L, "B", 200L), (3L, "C", 300L),
      (4L, "A", 1L), (4L, "B", 2L))
      .toDF("blk", "g", "v")
    val got = RankTests.friedman(df, "blk", "g", "v")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      ("A", 6L, 3L, 3L, Some(6.0)),
      ("B", 12L, 3L, 3L, Some(6.0)),
      ("C", 18L, 3L, 3L, Some(6.0))))
  }

  test("friedman: within-block ties take midranks") {
    // one block, values 1,1,2 → midranks 1.5, 1.5, 3 → ×2 = 3, 3, 6
    val df = Seq((1L, "A", 1L), (1L, "B", 1L), (1L, "C", 2L))
      .toDF("blk", "g", "v")
    val got = RankTests.friedman(df, "blk", "g", "v")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    // Σ(2R)² = 9+9+36 = 54; χ² = 3·54/(1·3·4) − 3·1·4 = 13.5 − 12 = 1.5
    assert(got === Seq(
      ("A", 3L, 1L, 3L, Some(1.5)),
      ("B", 3L, 1L, 3L, Some(1.5)),
      ("C", 6L, 1L, 3L, Some(1.5))))
  }

  test("mcnemar: hand cells with continuity correction") {
    // b (yes→no) = 3, c (no→yes) = 1 → χ² = (|3−1|−1)²/4 = 0.25
    val rows = Seq.fill(2)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(4)((false, false))
    val got = RankTests.mcnemar(rows.toDF("b", "a"), "b", "a")
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(got === ((10L, 2L, 3L, 1L, 4L, Some(0.25))))
  }

  test("mcnemar: no discordant pairs → NULL chi2") {
    val rows = Seq((true, true), (false, false))
    val got = RankTests.mcnemar(rows.toDF("b", "a"), "b", "a")
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(got === ((2L, 1L, 0L, 0L, 1L, None)))
  }

  test("kruskalWallis: every value tied → H = 0, corrected NULL") {
    val df = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L))
      .toDF("g", "v")
    val got = RankTests.kruskalWallis(df, "g", "v")
      .as[(String, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("A", 2L, 10L, 4L, 0.0, None),
      ("B", 2L, 10L, 4L, 0.0, None)))
  }
}
