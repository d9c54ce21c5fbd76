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
