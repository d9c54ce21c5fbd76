package graft.operators

import graft.SparkSpec

/** Pins [[PageRank]] against hand-computed fixpoints and invariants. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("2-cycle holds the uniform fixpoint exactly") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = PageRank.ranks(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // base + d·(0.5/1) = 0.075 + 0.425 = 0.5 every round, exactly
    assert(pr(1L) === 0.5)
    assert(pr(2L) === 0.5)
  }

  test("star graph: hub accumulates, leaves at sink floor") {
    // leaves 2,3,4 -> hub 1; hub -> leaf 2 (so hub has outdeg 1)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)).toDF("src", "dst")
    val n = 4.0
    var p = Map(1L -> 1 / n, 2L -> 1 / n, 3L -> 1 / n, 4L -> 1 / n)
    for (_ <- 1 to 3) {
      val base = (1.0 - 0.85) / n
      p = Map(
        1L -> (base + 0.85 * (p(2L) + p(3L) + p(4L))),
        2L -> (base + 0.85 * p(1L)),
        3L -> base, 4L -> base)
    }
    val pr = PageRank.ranks(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    p.foreach { case (k, v) => assert(math.abs(pr(k) - v) < 1e-12, s"node $k") }
    // no-inbound nodes sit exactly at (1-d)/N (same double op sequence)
    assert(pr(3L) === (1.0 - 0.85) / 4)
  }
}
