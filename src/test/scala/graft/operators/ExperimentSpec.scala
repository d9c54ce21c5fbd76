package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[Regression.simpsonAudit]], [[ExperimentMetrics]], and
  * [[Sax.topWords]] against constructed cases.
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("Simpson audit: classic reversal flags, aligned trends don't") {
    // two strata, each trending DOWN (slope −1000), but stratum B sits
    // higher AND dominates later x — the pooled fit slopes UP
    val a = (0L to 4L).map(x => ("A", x, 10000L - x * 1000L))
    val b = (6L to 10L).map(x => ("B", x, 30000L - x * 1000L))
    val r = Regression.simpsonAudit((a ++ b).toDF("st", "x", "y"),
      "st", "x", "y").collect()(0)
    assert(r.getDouble(0) > 0.0)
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getBoolean(3))
    // aligned: both strata and the pool trend up → no flag
    val up = (a ++ b).map { case (s0, x, y) => (s0, x, x * 1000L) }
    val r2 = Regression.simpsonAudit(up.toDF("st", "x", "y"),
      "st", "x", "y").collect()(0)
    assert(r2.getLong(2) === 0L && !r2.getBoolean(3))
  }

  test("ratio delta CI: constant ratio has zero variance; bounds order") {
    // y = 2 clicks, x = 10 cents for every user → R = 5 exactly,
    // all variances 0 → se 0, CI degenerate at 5
    val const = (1L to 20L).map(_ => (10L, 2L)).toDF("x", "y")
    val r = ExperimentMetrics.ratioDeltaCi(const, "x", "y").collect()(0)
    assert(r.getLong(0) === 20L && r.getDouble(1) === 5.0 &&
      r.getDouble(2) === 0.0 && r.getDouble(3) === 5.0 &&
      r.getDouble(4) === 5.0)
    // varied: CI brackets the ratio
    val varied = (1L to 100L).map(i => (i % 30L * 10L, 1L + i % 3L))
      .toDF("x", "y")
    val v = ExperimentMetrics.ratioDeltaCi(varied, "x", "y").collect()(0)
    assert(v.getDouble(3) < v.getDouble(1) && v.getDouble(1) < v.getDouble(4))
    // zero denominator mass → NULL readout
    val zero = Seq((5L, 0L), (7L, 0L)).toDF("x", "y")
    assert(ExperimentMetrics.ratioDeltaCi(zero, "x", "y").collect()(0)
      .isNullAt(1))
  }

  test("SRM: balanced arms pass, a 60/40 split flags") {
    val ok = (1L to 100L).map(i => (i % 2 == 0)).toDF("arm")
    val r = ExperimentMetrics.srmCheck(ok, "arm").collect()(0)
    assert(r.getDouble(2) === 0.0 && !r.getBoolean(3))
    // 600 vs 400: chi2 = 200²/1000 = 40 >> 3.84
    val bad = ((1 to 600).map(_ => true) ++ (1 to 400).map(_ => false))
      .toDF("arm")
    val r2 = ExperimentMetrics.srmCheck(bad, "arm").collect()(0)
    assert(r2.getDouble(2) === 40.0 && r2.getBoolean(3))
  }

  test("SAX: alternating series yields the alternating word") {
    // values alternate low/high → symbols alternate a/d (z = ±1), and
    // every 3-gram is ada or dad
    val v = (0L until 20L).map(t => ("k", t, if (t % 2 == 0) 0L else 100L))
      .toDF("k", "t", "y")
    val r = Sax.topWords(v, "k", "t", "y", w = 3, topPerKey = 2).collect()
    assert(r.map(_.getString(1)).toSet === Set("ada", "dad"))
    assert(r.map(_.getLong(2)).sum === 18L)
    // constant series: sigma 0 → no words at all
    val const = (0L until 10L).map(t => ("c", t, 5L)).toDF("k", "t", "y")
    assert(Sax.topWords(const, "k", "t", "y", 3, 2).isEmpty)
  }
}
