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

  test("lowerMedianPerKey matches brute-force per-key medians, ties and widths mixed") {
    val data = Map(
      "a" -> Seq(5L, 1L, 9L, 7L, 3L),               // odd n → 5
      "b" -> Seq(10L, 20L, 30L, 40L),                // even n → lower middle 20
      "c" -> Seq(-7L, -7L, -7L, 1000000L),           // ties + wide range → -7
      "d" -> Seq(42L))                               // singleton → 42
    val df = data.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }
      .toDF("k", "v")
    val got = ExactSelection.lowerMedianPerKey(df, "k", "v")
      .as[(String, Long, Long)].collect().toSeq
    def brute(vs: Seq[Long]) = vs.sorted.apply(((vs.size + 1) / 2) - 1)
    assert(got === data.toSeq.sortBy(_._1).map { case (k, vs) =>
      (k, vs.size.toLong, brute(vs)) })
    // multi-level drill agrees (maxBuckets=4 forces several rounds)
    val deep = ExactSelection.lowerMedianPerKey(df, "k", "v",
        maxBuckets = 4)
      .as[(String, Long, Long)].collect().toSeq
    assert(deep === got)
  }

  test("quantilesDiscPerKey matches brute-force per-key percentile_disc") {
    val data = Map(
      "a" -> (1L to 100L).map(i => (i * 13) % 101),
      "b" -> Seq(5L, 5L, 5L, 7L, 1000000L),
      "c" -> Seq(-9L))
    val df = data.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }
      .toDF("k", "v")
    val qs = Seq(0.5, 0.95, 0.99)
    val got = ExactSelection.quantilesDiscPerKey(df, "k", "v", qs)
      .as[(String, Double, Long, Long, Long)].collect().toSeq
    val want = for {
      (k, vs) <- data.toSeq.sortBy(_._1)
      q <- qs
      sorted = vs.sorted
      rk = math.max(1L, math.ceil(q * vs.size).toLong)
    } yield (k, q, rk, sorted((rk - 1).toInt), vs.size.toLong)
    assert(got === want)
  }

  test("keyed drill survives many keys under a tiny driver budget") {
    // 500 keys × wide domains with driverRowBudget=2048: the per-round
    // allowance shrinks to 4 buckets/range (2048/500) instead of
    // collecting 500 × 2^16 rows — the r11 footgun. Results must stay
    // exact (more rounds, same answer).
    val df = (0 until 500).flatMap { k =>
      (1 to 7).map(i => (s"k$k", (i * 997L + k * 31L) % 100000L))
    }.toDF("k", "v")
    val got = ExactSelection.lowerMedianPerKey(df, "k", "v",
        driverRowBudget = 2048L)
      .as[(String, Long, Long)].collect()
      .map { case (k, _, v) => k -> v }.toMap
    val want = (0 until 500).map { k =>
      val vs = (1 to 7).map(i => (i * 997L + k * 31L) % 100000L).sorted
      s"k$k" -> vs(3)
    }.toMap
    assert(got === want)
    // a key count that cannot even afford 2 buckets per range fails
    // loudly instead of flooding the driver
    val e = intercept[IllegalArgumentException] {
      ExactSelection.lowerMedianPerKey(df, "k", "v",
        driverRowBudget = 100L)
    }
    assert(e.getMessage.contains("GROUP-like"))
  }

  test("madOutliersPerKey: brute-force median/MAD, zero-MAD flags all deviants") {
    val data = Map(
      // median 10, devs {8,1,0,2,90} → MAD 2, 3·MAD=6 → outliers {2,100}
      "a" -> Seq(2L, 9L, 10L, 12L, 100L),
      // constant key: MAD 0 → every deviating row flags (q109 law)
      "b" -> Seq(5L, 5L, 5L, 7L),
      "c" -> Seq(42L)) // singleton: MAD 0, no deviants
    val df = data.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }
      .toDF("k", "v")
    val got = RobustStats.madOutliersPerKey(df, "k", "v")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 5L, 10L, 2L, 2L),
      ("b", 4L, 5L, 0L, 1L),
      ("c", 1L, 42L, 0L, 0L)))
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

  test("theilSenSlope: median pairwise slope on hand points, outlier ignored") {
    // key m: y = 5x in cents ppm at x=1..4 plus a wild outlier at x=5
    // pair slopes (ppm): among the 4 clean points all 5_000_000;
    // the 4 pairs touching (5, 1_000_000): large — median of the 10
    // slopes (sorted) is still 5_000_000 (6 of 10 pairs are clean)
    val m = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 20L),
      (5L, 1000000L)).map { case (x, y) => ("m", x, y) }
    // key e: even pair count — x=1,2,3 with slopes 10, 5, 0 ppm·1e6?
    //   points (1,0),(2,10),(3,10): slopes 10e6 (1→2), 0 (2→3),
    //   5e6 (1→3) → n=3 odd, median 5e6. Use 4 points for even:
    //   (1,0),(2,10),(3,10),(4,40) → 6 slopes: 10e6,0,30e6,5e6,15e6,
    //   (1→4)=13333333 (truncated 40/3·1e6) → sorted 0,5e6,10e6,
    //   13333333,15e6,30e6 → lower median (rank 3) = 10e6
    val e = Seq((1L, 0L), (2L, 10L), (3L, 10L), (4L, 40L))
      .map { case (x, y) => ("e", x, y) }
    val got = Regression.theilSenSlope(
        (m ++ e).toDF("k", "x", "y"), "k", "x", "y")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("e", 6L, 10000000L), ("m", 10L, 5000000L)))
  }

  test("theilSenSlope: negative slopes truncate toward zero on both engines") {
    // (1,10),(2,3): slope −7e6; (2,3),(3,1): −2e6; (1,10),(3,1):
    // −9/2·1e6 = −4.5e6 → truncates to −4500000 (exact), n=3,
    // median = −4500000
    val df = Seq(("n", 1L, 10L), ("n", 2L, 3L), ("n", 3L, 1L))
      .toDF("k", "x", "y")
    val got = Regression.theilSenSlope(df, "k", "x", "y")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("n", 3L, -4500000L)))
  }

  test("richClub: hand graph — hubs form a complete club") {
    // K4 on 1..4 (each degree ≥ 3) plus leaves 5,6,7 hanging off
    // node 1 (degree(1)=6). degrees: 1→6, 2..4→3, 5..7→1
    // k=1: nodes {1,2,3,4} (deg>1), club edges = K4's 6 → φ = 1e6
    // k=3: nodes {1} → NULL; k=5: {1} → NULL
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (1, 5), (1, 6), (1, 7)).toDF("u", "v")
    val got = GraphStats.richClub(edges, "u", "v", Seq(1L, 3L, 5L))
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 6L, Some(1000000L)),
      (3L, 1L, 0L, None),
      (5L, 1L, 0L, None)))
  }

  test("richClub: duplicate / reversed / self-loop edges collapse") {
    val edges = Seq((1, 2), (2, 1), (1, 2), (2, 2), (2, 3))
      .toDF("u", "v")
    val got = GraphStats.richClub(edges, "u", "v", Seq(0L, 1L))
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // clean graph: 1–2, 2–3; degrees 1,2,1
    // k=0: all 3 nodes, 2 edges → φ = 2·2e6/6 = 666666
    // k=1: just node 2 → NULL
    assert(got === Seq(
      (0L, 3L, 2L, Some(666666L)),
      (1L, 1L, 0L, None)))
  }

  test("mmrRerank: diversity beats a redundant higher-relevance candidate") {
    // query (1,0); id10 = near the query (rel ≈ 0.994);
    // id11 nearly parallel to id10 (rel ≈ 0.991, redundancy ≈ 0.9997);
    // id12 diagonal (rel ≈ 0.707, redundancy to id10 ≈ 0.781).
    // λ=0.3: sc(11) ≈ 0.297 − 0.700 = −0.402
    //        sc(12) ≈ 0.212 − 0.547 = −0.334 → id12 wins pick 2
    val q = Seq(Tuple1(Array(1f, 0f))).toDF("query_vec")
    val corpus = Seq(
      (10L, Array(0.9f, 0.1f)),
      (11L, Array(0.9f, 0.12f)),
      (12L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(q, corpus, k = 2, window = 3,
        lambda = 0.3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(10L, 12L))
    // pure relevance (λ=1) keeps the redundant id11 instead
    val rel = Similarity.mmrRerank(q, corpus, k = 2, window = 3,
        lambda = 1.0)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(rel.map(_._2) === Seq(10L, 11L))
  }

  test("mmrRerank: anti-correlated candidates keep their NEGATIVE max-sim bonus") {
    // differential pin against a direct max-over-selected reference:
    // a 0-floored running max would erase negative similarities and
    // reorder the picks (regression caught live at sf0.001)
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = Array(1f, 0f, 0f)
    val vecs = Seq(
      10L -> Array(0.9f, 0.44f, 0f), 11L -> Array(0.5f, -0.1f, 0.2f),
      12L -> Array(0.1f, -0.9f, 0.4f), 13L -> Array(0.3f, 0.95f, 0f),
      14L -> Array(-0.2f, 0.1f, 0.9f), 15L -> Array(0.6f, 0.6f, -0.5f))
    // reference greedy with an explicit max over ALL earlier picks
    val rel = vecs.map { case (id, v) => id -> round6(cos(qv, v)) }.toMap
    var sel = Vector.empty[Long]
    var rem = vecs.sortBy { case (id, v) => (-cos(qv, v), id) }.map(_._1)
    while (sel.size < 4) {
      val pick = rem.map { id =>
        val ms = if (sel.isEmpty) 0.0
          else sel.map(s => round6(cos(
            vecs.toMap.apply(id), vecs.toMap.apply(s)))).max
        (id, round6(0.6 * rel(id) - 0.4 * ms))
      }.minBy { case (id, sc) => (-sc, id) }._1
      sel :+= pick; rem = rem.filterNot(_ == pick)
    }
    val got = Similarity.mmrRerank(
        Seq(Tuple1(qv)).toDF("query_vec"),
        vecs.toDF("vec_id", "embedding"),
        k = 4, window = 6, lambda = 0.6)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) === sel)
  }

  test("mmrRerank: score ties break on ascending id inside the window") {
    val q = Seq(Tuple1(Array(1f, 0f))).toDF("query_vec")
    val corpus = Seq(
      (20L, Array(3f, 4f)), (7L, Array(3f, 4f)), // identical → tie
      (30L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(q, corpus, k = 2, window = 2,
        lambda = 0.7)
      .as[(Long, Long, Double, Double)].collect().toSeq
    // window=2 keeps id 30 (rel 1.0) and — of the rel-0.6 tie — the
    // smaller id 7; the second pick is then forced to 7
    assert(got.map(_._2) === Seq(30L, 7L))
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
