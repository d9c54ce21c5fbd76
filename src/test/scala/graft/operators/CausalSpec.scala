package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[Resampling]] (Poisson bootstrap, split conformal) and
  * [[Matching]] (caliper ATT, difference-in-differences) against hand
  * computations and determinism checks.
  */
class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("Poisson bootstrap: deterministic, ordered CI bracketing the data") {
    val df = (1L to 500L).map(i => (i, 1000L + (i % 97L) * 10L))
      .toDF("id", "v")
    val r1 = Resampling.poissonBootstrapCi(df, "id", "v", reps = 40)
      .collect()(0)
    assert(r1.getLong(0) === 500L && r1.getLong(1) === 40L)
    val (mean, lo, hi) = (r1.getDouble(2), r1.getDouble(3), r1.getDouble(4))
    assert(lo <= hi && lo >= 1000.0 && hi <= 1960.0)
    assert(mean > lo - 50 && mean < hi + 50)
    // hash-seeded weights: a second run is bit-identical
    val r2 = Resampling.poissonBootstrapCi(df, "id", "v", reps = 40)
      .collect()(0)
    assert(r1.toSeq === r2.toSeq)
  }

  test("Poisson bootstrap: degenerate tiny input keeps the summary row") {
    // one row, 40 replicates: ~37% of replicates draw weight 0 and are
    // dropped, so rank 38 does not exist — the summary row must still
    // emit (with NULL bounds where the rank is missing), matching the
    // oracle's scalar-subquery behavior, not collapse to zero rows
    val r = Resampling.poissonBootstrapCi(
      Seq((1L, 100L)).toDF("id", "v"), "id", "v", reps = 40).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 1L && r(0).getDouble(2) === 100.0)
  }

  test("split conformal: hand-computed quantile, coverage, infinite interval") {
    // calib A = 1..10: median 5, sorted devs 0,1,1,2,2,3,3,4,4,5;
    // conformal rank ceil(11*0.9) = 10 → qhat = 5
    val calib = (1L to 10L).map(v => ("A", v, true))
    val test = Seq(("A", 0L, false), ("A", 11L, false), ("A", 5L, false))
    val r = Resampling.splitConformal(
      (calib ++ test).toDF("k", "v", "cal"), "k", "v", "cal").collect()(0)
    assert(r.getLong(1) === 10L && r.getLong(2) === 3L)
    assert(r.getLong(3) === 5L && r.getLong(4) === 5L)
    assert(r.getLong(5) === 2L && r.getLong(6) === 666666L)
    // n_calib = 2: rank 3 of 2 → infinite interval, everything covered
    val tiny = Seq(("B", 1L, true), ("B", 9L, true), ("B", 100L, false))
      .toDF("k", "v", "cal")
    val r2 = Resampling.splitConformal(tiny, "k", "v", "cal").collect()(0)
    assert(r2.isNullAt(4) && r2.getLong(5) === 1L)
  }

  test("caliper match: nearest control, tie-break, unmatched treated") {
    val df = Seq(
      (1L, true, 100L, 50L), (2L, true, 250L, 70L),
      (10L, false, 90L, 40L), (11L, false, 105L, 45L),
      (12L, false, 500L, 99L)).toDF("id", "t", "s", "o")
    val r = Matching.caliperMatchAtt(df, "id", "t", "s", "o", caliper = 20L)
      .collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L && r.getLong(2) === 1L)
    assert(r.getLong(3) === 500000L)
    assert(r.getDouble(4) === 50.0 && r.getDouble(5) === 45.0 &&
      r.getDouble(6) === 5.0)
    // equidistant controls: the smaller control score wins
    val tie = Seq((1L, true, 100L, 10L),
      (10L, false, 95L, 7L), (11L, false, 105L, 9L)).toDF("id", "t", "s", "o")
    val rt = Matching.caliperMatchAtt(tie, "id", "t", "s", "o", 20L)
      .collect()(0)
    assert(rt.getDouble(5) === 7.0)
    // negative scores: pmod-floor banding still finds the neighbor
    val neg = Seq((1L, true, -5L, 10L), (10L, false, -15L, 4L))
      .toDF("id", "t", "s", "o")
    val rn = Matching.caliperMatchAtt(neg, "id", "t", "s", "o", 10L)
      .collect()(0)
    assert(rn.getLong(2) === 1L && rn.getDouble(6) === 6.0)
  }

  test("difference-in-differences: hand 2x2, empty cell nulls") {
    val df = Seq((true, false, 10L), (true, true, 30L),
      (false, false, 5L), (false, true, 10L)).toDF("g", "p", "y")
    val r = Matching.didEstimate(df, "g", "p", "y").collect()(0)
    assert(r.getDouble(8) === 15.0)
    val partial = Matching.didEstimate(
      df.filter(!(col("g") && col("p"))), "g", "p", "y").collect()(0)
    assert(partial.isNullAt(8))
  }
}
