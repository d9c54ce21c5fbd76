package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col

/** Pins [[Holt]] against hand recurrences and the q263/q265 queries
  * against their defining identities.
  */
class TrendSampleSpec extends SparkSpec {
  import spark.implicits._

  test("Holt: hand recurrence with alpha=1/5, beta=1/10") {
    val s = Seq(("a", 1L, 100L), ("a", 2L, 110L), ("a", 3L, 130L))
      .toDF("k", "t", "x")
    val got = Holt.linearTrend(s, "k", "t", "x")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // t1: l=100 b=0; t2: l=round(510/5)=102, b=round(2/10)=0;
    // t3: l=round((130+4*102)/5)=round(538/5)=108, b=round(6/10)=1
    assert(got.toSeq === Seq((1L, 100L, 0L, 100L), (2L, 102L, 0L, 102L),
      (3L, 108L, 1L, 109L)))
  }

  test("Holt: negative and half-negative trend rounds toward +inf") {
    val s = Seq(("a", 1L, 100L), ("a", 2L, 50L),
      ("b", 1L, 100L), ("b", 2L, 75L)).toDF("k", "t", "x")
    val got = Holt.linearTrend(s, "k", "t", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // a: l2=round(450/5)=90, b2=round(-10/10)=-1
    assert(got(("a", 2L)) === ((90L, -1L)))
    // b: l2=round(475/5)=95, b2=round(-5/10)=round(-0.5)=0 — the
    // half case distinguishes half-toward-+inf from half-away-from-0
    assert(got(("b", 2L)) === ((95L, 0L)))
  }

  test("Holt: keys fold independently") {
    val s = Seq(("a", 1L, 10L), ("a", 2L, 20L),
      ("z", 1L, 10L), ("z", 2L, 20L)).toDF("k", "t", "x")
    val rows = Holt.linearTrend(s, "k", "t", "x").collect()
    val byKey = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(3),
        r.getLong(4))).toSeq).toMap
    assert(byKey("a") === byKey("z"))
  }

  test("q263: join-of-samples equals sample-of-join per nation") {
    val rows = SparkEntry.q263CorrelatedSample(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("orders_join_samples") ===
        r.getAs[Long]("orders_sample_join"),
        s"referential sampling identity broken for ${r.getString(0)}")
      assert(r.getAs[Long]("est_orders") ===
        10 * r.getAs[Long]("orders_join_samples"))
    }
  }

  test("q265: growth curve is monotone and the fit is sublinear") {
    val rows = SparkEntry.q265HeapsLaw(spark, sf()).collect()
    assert(rows.length === 10)
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val ntok = rows.map(_.getAs[Long]("n_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(ntok.zip(ntok.tail).forall { case (a, b) => a < b })
    val beta = rows.head.getAs[Double]("heaps_beta")
    // sublinear always; exactly 0.0 on this closed template vocabulary
    assert(beta >= 0.0 && beta < 1.1, s"beta=$beta")
  }
  test("HoltWinters: hand recurrence with period 2") {
    // m=2, series 10, 20, 30, 40: init l0 = rdiv(30,2) = 15, b=0,
    // sv = [-5, 5].
    // t3 (x=30): sOld=-5; l=rdiv(35+3*15,4)=rdiv(80,4)=20;
    //   b=rdiv(5+0,10)=rdiv(5,10)=1 (half->+inf);
    //   s=rdiv(10+4*(-5),5)=rdiv(-10,5)=-2; sv=[5,-2];
    //   forecast = 20+1+5 = 26
    // t4 (x=40): sOld=5; l=rdiv(35+3*21,4)=rdiv(98,4)=25 (24.5->+inf);
    //   b=rdiv(5+9,10)=rdiv(14,10)=1; s=rdiv(15+20,5)=7; sv=[-2,7];
    //   forecast = 25+1-2 = 24
    val s = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 4L, 40L)).toDF("k", "t", "x")
    val got = Holt.seasonalTrend(s, "k", "t", "x", period = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq((3L, 20L, 1L, -2L, 26L),
      (4L, 25L, 1L, 7L, 24L)))
  }

  test("HoltWinters: series no longer than the period emit nothing") {
    val s = Seq(("a", 1L, 10L), ("a", 2L, 20L),
      ("b", 1L, 5L)).toDF("k", "t", "x")
    assert(Holt.seasonalTrend(s, "k", "t", "x", period = 2).count() === 0)
  }
}
