package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[FuzzyJoin.blockedLevenshtein]] against a brute-force
  * per-block cross product scored with the UNbounded `levenshtein` —
  * proving the length band and the threshold (-1) form are pure
  * pruning, never a semantics change.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // block 0: near-identical names, one far outlier
    (1L, 0, "martha stuart"), (2L, 0, "marta stuart"), // dist 1
    (3L, 0, "martha stewart"),                          // 1 of #1, 2 of #2
    (4L, 0, "zebulon quincy"),                          // far from all
    // block 1: same text as block 0 members — must NOT pair across
    (5L, 1, "martha stuart"), (6L, 1, "martha stuartxx"), // len diff = 2
    (7L, 1, "martha stuartxxx"),                          // len diff 3 of #5
    // block 2: singleton — no pairs at all
    (8L, 2, "alone")
  ).toDF("id", "blk", "name")

  private def brute(maxDist: Int) = {
    val a = rows.select(col("id").as("ia"), col("blk").as("ba"),
      col("name").as("na"))
    val b = rows.select(col("id").as("ib"), col("blk").as("bb"),
      col("name").as("nb"))
    a.join(b, col("ba") === col("bb") && col("ia") < col("ib"))
      .withColumn("d", levenshtein(col("na"), col("nb")))
      .filter(col("d") <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getInt(6)).toMap
  }

  test("blocked result equals brute-force per-block pairs, dist exact") {
    for (maxDist <- Seq(1, 2, 3)) {
      val got = FuzzyJoin.blockedLevenshtein(rows, "id", "name",
          Seq("blk"), maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(4)).toMap
      assert(got === brute(maxDist), s"maxDist=$maxDist")
    }
  }

  test("identical text in different blocks never pairs") {
    val got = FuzzyJoin.blockedLevenshtein(rows, "id", "name",
        Seq("blk"), maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ids 1 and 5 share exact text but sit in different blocks
    assert(!got.contains((1L, 5L)) && got.isEmpty)
  }

  test("length band keeps pairs at exactly |len diff| = maxDist") {
    // #5 vs #6: lengths differ by exactly 2 and dist IS 2 — the band
    // predicate (<= maxDist) must keep it; #5 vs #7 (diff 3) pruned
    val got = FuzzyJoin.blockedLevenshtein(rows, "id", "name",
        Seq("blk"), maxDist = 2)
      .filter(col("id_a") >= 5L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    assert(got((5L, 6L)) === 2)
    assert(!got.contains((5L, 7L)))
    // ...and dist 3 via substitutions at equal length is also pruned
    assert(got.get((6L, 7L)).forall(_ <= 2))
  }

  test("sorted neighborhood: rank-window pairs match brute force; " +
    "boundary-straddling matches survive") {
    // names sort so that near-identical pairs sit adjacent even though
    // their blocks (blk) differ — the case hard blocking loses
    val df = Seq(
      (1L, 0, "anna maria"), (2L, 1, "anna marla"), // adjacent in sort
      (3L, 0, "benny zed"), (4L, 1, "benny zeds"),
      (5L, 0, "zz outlier")
    ).toDF("id", "blk", "name")
    val got = FuzzyJoin.sortedNeighborhood(df, "id", "name",
        Seq(col("name").asc, col("id").asc), window = 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    // sort order: anna maria(1), anna marla(2), benny zed(3),
    // benny zeds(4), zz outlier(5); window 2 pairs each rank with the
    // next two; only dist<=2 survive
    assert(got === Set((1L, 2L, 1L, 1), (3L, 4L, 1L, 1)))
    // the cross-block pair (1,2) was found — hard blocking on blk
    // would have missed it
    val blocked = FuzzyJoin.blockedLevenshtein(df, "id", "name",
        Seq("blk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!blocked.contains((1L, 2L)))
  }

  test("composite blocking key requires ALL parts equal") {
    val df = Seq((1L, 0, 0, "aaa"), (2L, 0, 1, "aaa"), (3L, 0, 0, "aab"))
      .toDF("id", "b1", "b2", "name")
    val got = FuzzyJoin.blockedLevenshtein(df, "id", "name",
        Seq("b1", "b2"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L))) // (1,2) differ in b2; (2,3) too
  }
}
