package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col

/** Pins [[Coreset]] and [[Autocorrelation]] against hand geometry /
  * hand arithmetic, and the q258 CUPED + q259 sliding-HLL queries
  * against their algebraic invariants.
  */
class SelectionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("kCenter: farthest-point traversal on a hand line") {
    // ids 1..5 at x = 0, 1, 10, 11, 30 (micro-units x1e6)
    val pts = Seq((1L, Array(0f)), (2L, Array(1f)), (3L, Array(10f)),
      (4L, Array(11f)), (5L, Array(30f)))
      .toDF("vec_id", "embedding")
    val got = Coreset.kCenter(pts, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val m = 1000000L
    // seed = id 1 (x=0); coverage after 1 center = 30^2
    // next = id 5 (x=30); then id 4 (x=11, min-dist 11^2 beats id 3's
    // 10^2); final coverage = 1^2 (ids 2 and 3 each 1 from a center)
    assert(got === Array(
      (1L, 1L, 0L, 900L * m * m),
      (2L, 5L, 900L * m * m, 121L * m * m),
      (3L, 4L, 121L * m * m, 1L * m * m)))
  }

  test("kCenter: stops early when every point duplicates a center") {
    val pts = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f)),
      (3L, Array(5f, 5f))).toDF("vec_id", "embedding")
    val got = Coreset.kCenter(pts, "vec_id", "embedding", k = 5)
    // only 2 distinct locations -> 2 centers, final coverage 0
    val rows = got.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 3L))
    assert(rows.last.getLong(3) === 0L)
  }

  test("motifDiscord: planted repeat and planted spike on a flat series") {
    // flat 100s, the shape (1,9,1) planted at t=3 and t=11 (motif),
    // a lone spike 500 at t=17 (discord); w=3, exclusion |i-j|>=3
    val xs = Array.fill(20)(100L)
    for (t <- Seq(3, 11)) { xs(t - 1) = 1L; xs(t) = 9L; xs(t + 1) = 1L }
    xs(16) = 500L
    val s = xs.zipWithIndex.toSeq.map { case (x, i) => (i + 1L, x) }
      .toDF("t", "x")
    val got = MotifProfile.motifDiscord(s, "t", "x", windowLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // the plant repeats its CONTEXT too (everything 8 apart around
    // the shapes matches exactly), so several pairs tie at ssd 0 and
    // the (i, j) tiebreak picks the earliest: windows 1 and 9
    val motif = got.find(_._1 == "motif").get
    assert(motif === (("motif", 1L, 9L, 0.0)))
    val discord = got.find(_._1 == "discord").get
    // the spike window's nearest neighbor is still far: ssd > any
    // flat-window pair's
    assert(discord._2 >= 15L && discord._2 <= 17L && discord._4 > 0.0)
  }

  test("motifDiscord: series shorter than 2w emits nothing") {
    val s = (1L to 5L).map(t => (t, t)).toDF("t", "x")
    assert(MotifProfile.motifDiscord(s, "t", "x", windowLen = 3)
      .count() === 0L)
  }

  test("ccf: identical series peaks at exactly 1.0 at lag 0; pair counts taper") {
    val s = (1L to 8L).map(t => (t, t * t % 7, t * t % 7))
      .toDF("t", "x", "y")
    val got = Autocorrelation.ccf(s, "t", "x", "y", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(-2L, -1L, 0L, 1L, 2L))
    assert(got.map(_._2).toSeq === Seq(6L, 7L, 8L, 7L, 6L))
    assert(got.find(_._1 == 0L).get._3 === 1.0)
    // x ≡ y makes the curve symmetric: ccf(k) = ccf(−k)
    assert(got.find(_._1 == 1L).get._3 === got.find(_._1 == -1L).get._3)
  }

  test("ccf: a shifted copy peaks at the shift lag, not at 0") {
    // y_t = x_{t-1}: x LEADS y by one period → peak at k = +1
    val x = Seq(1L, 7L, 2L, 9L, 3L, 8L, 1L, 6L)
    val y = 0L +: x.dropRight(1)
    val s = x.indices.map(i => (i.toLong, x(i), y(i))).toDF("t", "x", "y")
    val got = Autocorrelation.ccf(s, "t", "x", "y", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.maxBy(_._2)._1 === 1L)
  }

  test("acf: alternating series has the hand lag structure") {
    // x = 1,2,1,2,1,2: n=6, S=9, devs n*x-S = -3,+3 alternating;
    // den = 54; lag1: 5 pairs of -9 -> -45/54; lag2: 4 pairs of +9
    val s = (1 to 6).map(t => (t, if (t % 2 == 1) 1L else 2L))
      .toDF("t", "x")
    val got = Autocorrelation.acf(s, "t", "x", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) === ((1L, 5L, -0.833333)))
    assert(got(1) === ((2L, 4L, 0.666667)))
  }

  test("acf: constant series yields NULL (0/0) not a crash") {
    val s = (1 to 5).map(t => (t, 7L)).toDF("t", "x")
    val rows = Autocorrelation.acf(s, "t", "x", maxLag = 2).collect()
    assert(rows.length === 2 && rows.forall(_.isNullAt(2)))
  }

  test("q258 CUPED: adjustment preserves the pooled mean") {
    val r = SparkEntry.q258Cuped(spark, sf()).collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a").toDouble,
      r.getAs[Long]("n_b").toDouble)
    val pooledRaw = na * r.getAs[Double]("mean_a_raw") +
      nb * r.getAs[Double]("mean_b_raw")
    val pooledAdj = na * r.getAs[Double]("mean_a_adj") +
      nb * r.getAs[Double]("mean_b_adj")
    // sum of (X - xbar) over ALL users is 0, so the theta shift
    // cancels in the pooled mean (up to the 6-dp display rounding)
    assert(math.abs(pooledRaw - pooledAdj) < (na + nb) * 1e-5)
    val rho = r.getAs[Double]("rho_sq")
    assert(rho >= 0.0 && rho <= 1.0)
  }

  test("q259 sliding HLL: exact trailing distinct matches a direct union") {
    val out = SparkEntry.q259SlidingHll(spark, sf()).collect()
    assert(out.nonEmpty)
    val byDay = out.map(r => r.getAs[Long]("day") ->
      r.getAs[Long]("exact_distinct")).toMap
    // independent recompute for the LAST window: users active in the
    // trailing 7 days of the max observed day
    val wMax = byDay.keys.max
    val direct = graft.Tables.events(spark, sf())
      .filter(col("user_id").isNotNull)
      .filter(org.apache.spark.sql.functions.expr(
        s"ts div 86400000000000L between ${wMax - 6} and $wMax"))
      .select(col("user_id")).distinct().count()
    assert(byDay(wMax) === direct)
    // every window's trailing distinct >= that single day's distinct
    val daily = graft.Tables.events(spark, sf())
      .filter(col("user_id").isNotNull)
      .select(org.apache.spark.sql.functions
        .expr("ts div 86400000000000L").as("day"), col("user_id"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    daily.foreach { case (d, n) =>
      assert(byDay(d) >= n, s"window $d below its own day")
    }
  }
}
