package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Pins [[TrendTests.mannKendall]], [[Anova.oneWayF]] /
  * [[Anova.brownForsythe]], and [[MultipleTesting]] against hand
  * computations.
  */
class AnovaTrendSpec extends SparkSpec {
  import spark.implicits._

  test("Mann-Kendall: monotone series, constant series, two keys") {
    // strictly increasing n=5: S = 10, Var = 5·4·15/18 = 16.667,
    // z = (10−1)/sqrt(16.667) = 2.204541
    val up = (1L to 5L).map(i => ("u", i, i * 10L)).toDF("k", "x", "y")
    val r1 = TrendTests.mannKendall(up, "k", "x", "y").collect()(0)
    assert(r1.getLong(1) === 5L && r1.getLong(2) === 10L &&
      r1.getLong(3) === 10L)
    assert(math.abs(r1.getDouble(4) - 2.204541) < 1e-6)
    // strictly decreasing mirrors to S = −10, z = −2.204541
    val dn = (1L to 5L).map(i => ("d", i, -i * 10L)).toDF("k", "x", "y")
    val r2 = TrendTests.mannKendall(dn, "k", "x", "y").collect()(0)
    assert(r2.getLong(3) === -10L &&
      math.abs(r2.getDouble(4) + 2.204541) < 1e-6)
    // constant: S = 0 and the tie term cancels the variance → z NULL
    val ct = (1L to 5L).map(i => ("c", i, 7L)).toDF("k", "x", "y")
    val r3 = TrendTests.mannKendall(ct, "k", "x", "y").collect()(0)
    assert(r3.getLong(3) === 0L && r3.isNullAt(4))
    // both keys in one pass, keyed independently
    val both = TrendTests.mannKendall(up.unionAll(dn), "k", "x", "y")
      .orderBy(col("k")).collect()
    assert(both.map(_.getLong(3)).toSeq === Seq(-10L, 10L))
    // a single-point group has no pairs but still emits its row:
    // (n=1, n_pairs=0, s=0, z NULL) — the docstring contract
    val one = Seq(("s", 1L, 5L)).toDF("k", "x", "y")
    val r4 = TrendTests.mannKendall(one, "k", "x", "y").collect()
    assert(r4.length === 1)
    assert(r4(0).getLong(1) === 1L && r4(0).getLong(2) === 0L &&
      r4(0).getLong(3) === 0L && r4(0).isNullAt(4))
  }

  test("ANOVA one-way F: textbook two-group example and degenerates") {
    // A=[1,2,3] B=[4,5,6] in milli-units (the truncating-term
    // contract: sub-unit remainders drop, so the textbook values
    // need non-toy magnitudes — here ×1000 keeps them exact):
    // SS_b = 13.5e6, SS_w = 4e6, F = 13.5, eta² = 13.5/17.5
    val df = Seq(("A", 1000L), ("A", 2000L), ("A", 3000L),
      ("B", 4000L), ("B", 5000L), ("B", 6000L)).toDF("g", "y")
    val r = Anova.oneWayF(df, "g", "y").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getDouble(2) === 13500000.0 && r.getDouble(3) === 4000000.0)
    assert(r.getDouble(4) === 13.5 &&
      math.abs(r.getDouble(5) - 0.771429) < 1e-6)
    // one group: k < 2 → F null
    val one = Anova.oneWayF(df.filter(col("g") === "A"), "g", "y")
      .collect()(0)
    assert(one.isNullAt(4))
    // zero within-group variance → F null (infinite separation)
    val sep = Seq(("A", 1000L), ("A", 1000L), ("B", 2000L), ("B", 2000L))
      .toDF("g", "y")
    assert(Anova.oneWayF(sep, "g", "y").collect()(0).isNullAt(4))
  }

  test("Brown-Forsythe: hand-computed spread difference, equal spread") {
    // A=[5,5,5] devs [0,0,0]; B=[0,10,20] median 10, devs [10,0,10]
    // (milli-units) → SS_b = SS_w, F = 4.0, eta² = 0.5
    val df = Seq(("A", 5000L), ("A", 5000L), ("A", 5000L),
      ("B", 0L), ("B", 10000L), ("B", 20000L)).toDF("g", "y")
    val r = Anova.brownForsythe(df, "g", "y").collect()(0)
    assert(r.getDouble(4) === 4.0 && r.getDouble(5) === 0.5)
    // identical spreads → F = 0
    val eq = Seq(("A", 0L), ("A", 10000L), ("B", 100000L), ("B", 110000L))
      .toDF("g", "y")
    assert(Anova.brownForsythe(eq, "g", "y").collect()(0).getDouble(4) === 0.0)
  }

  test("normal p-value: known quantiles within the A&S error bound") {
    val z = Seq(0.0, 1.959964, 2.575829).toDF("z")
    val p = z.select(MultipleTesting.normalTwoSidedP(col("z")).as("p"))
      .collect().map(_.getDouble(0))
    assert(p(0) === 1.0)
    assert(math.abs(p(1) - 0.05) < 1e-4)
    assert(math.abs(p(2) - 0.01) < 1e-4)
  }

  test("Benjamini-Hochberg: step-up monotone adjustment and rejections") {
    // p = [.01,.02,.03,.5], m=4: raw = [.04,.04,.04,.5] → adj equal,
    // first three reject at α=.05; the .5 survives
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5))
      .toDF("k", "p")
    val r = MultipleTesting.benjaminiHochberg(df, "k", "p", alpha = 0.05)
      .orderBy(col("rank")).collect()
    assert(r.map(_.getDouble(3)).toSeq === Seq(0.04, 0.04, 0.04, 0.5))
    assert(r.map(_.getBoolean(4)).toSeq === Seq(true, true, true, false))
    // adjusted p caps at 1
    val hi = Seq(("a", 0.9), ("b", 0.99)).toDF("k", "p")
    val r2 = MultipleTesting.benjaminiHochberg(hi, "k", "p")
      .orderBy(col("rank")).collect()
    assert(r2.map(_.getDouble(3)).toSeq === Seq(0.99, 0.99))
    assert(r2.forall(!_.getBoolean(4)))
  }
}
