package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop}

/** Pins [[RangeJoinBandingRule]]: a keyless bounded time-band join
  * plans WITHOUT BroadcastNestedLoopJoin/CartesianProduct (banded
  * equi-join + residual instead), results are identical to the raw
  * predicate — including negative timestamps (floor-division banding)
  * and NULLs — and the rule stays away from joins that already have an
  * equi key. Registered through `experimental.extraOptimizations`
  * (same reasoning as LevenshteinRuleSpec: the shared test JVM).
  */
class RangeJoinBandingRuleSpec extends SparkSpec {

  private lazy val s = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBandingRule))
      spark.experimental.extraOptimizations ++= Seq(RangeJoinBandingRule)
    spark
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("BETWEEN band: no nested-loop join, banded equi-join instead, exact rows") {
    val sp = s; import sp.implicits._
    // negative ts included: truncating `div` would mis-band these
    val left = Seq((1L, -13L), (2L, -2L), (3L, 0L), (4L, 7L), (5L, 23L))
      .toDF("lid", "lt")
    val right = Seq((10L, -20L), (11L, -5L), (12L, 3L), (13L, 25L))
      .toDF("rid", "rt")
    val q = left.join(right,
      $"lt" >= $"rt" - 10L && $"lt" <= $"rt" + 5L)
    val plan = physical(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"quadratic join survived the rewrite:\n$plan")
    assert(plan.contains("Generate") || plan.contains("explode"),
      s"band replication missing:\n$plan")
    val got = q.select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lid, lt) <- Seq((1L, -13L), (2L, -2L), (3L, 0L), (4L, 7L), (5L, 23L))
      (rid, rt) <- Seq((10L, -20L), (11L, -5L), (12L, 3L), (13L, 25L))
      if lt >= rt - 10L && lt <= rt + 5L
    } yield (lid, rid)).toSet
    assert(got === want)
  }

  test("strict/reversed forms fire; NULL times drop on both paths") {
    val sp = s; import sp.implicits._
    val left = Seq[(Long, java.lang.Long)]((1L, 4L), (2L, null), (3L, 90L))
      .toDF("lid", "lt")
    val right = Seq[(Long, java.lang.Long)]((10L, 6L), (11L, null), (12L, 85L))
      .toDF("rid", "rt")
    // rt - 3 < lt AND rt > lt - 7  ⇔  rt − lt ∈ [−6, 3]  (strict→±1)
    val q = left.join(right, $"rt" - 3L < $"lt" && $"rt" > $"lt" - 7L)
    val plan = physical(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"no rewrite for strict forms:\n$plan")
    val got = q.select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (3L, 12L))) // null rows match nothing
  }

  test("single-side `rt - lt` form fires too") {
    val sp = s; import sp.implicits._
    val l = Seq((1L, 4L)).toDF("lid", "lt")
    val r = Seq((9L, 6L)).toDF("rid", "rt")
    val q = l.join(r, $"rt" - $"lt" >= -3L && $"rt" - $"lt" <= 5L)
    assert(physical(q).contains("__graft_band"),
      s"did not fire:\n${physical(q)}")
    assert(q.count() === 1L)
  }

  test("TIMESTAMP ± INTERVAL band: fires, no nested-loop, exact rows") {
    val sp = s; import sp.implicits._
    // the analyst-default shape: TIMESTAMP columns, INTERVAL literals —
    // pre-r11 this planned the quadratic BroadcastNestedLoopJoin
    def ts(min: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val lRows = Seq((1L, 0L), (2L, 3L), (3L, 11L), (4L, 27L))
    val rRows = Seq((10L, 4L), (11L, 9L), (12L, 30L))
    lRows.map { case (id, m) => (id, ts(m)) }.toDF("lid", "lt")
      .createOrReplaceTempView("bl")
    rRows.map { case (id, m) => (id, ts(m)) }.toDF("rid", "rt")
      .createOrReplaceTempView("br")
    val q = sp.sql("""SELECT lid, rid FROM bl JOIN br
      ON lt BETWEEN rt - INTERVAL '5' MINUTE AND rt + INTERVAL '5' MINUTE""")
    val plan = physical(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"TIMESTAMP band still plans the quadratic join:\n$plan")
    assert(plan.contains("__graft_band"), s"did not fire:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lid, lm) <- lRows; (rid, rm) <- rRows
      if math.abs(lm - rm) <= 5L
    } yield (lid, rid)).toSet
    assert(got === want)
  }

  test("DATE ± days band (date_add/date_sub): fires, exact rows") {
    val sp = s; import sp.implicits._
    def d(off: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(off).toString)
    val lRows = Seq((1L, 0), (2L, 2), (3L, 9), (4L, 20))
    val rRows = Seq((10L, 1), (11L, 8), (12L, 25))
    lRows.map { case (id, o) => (id, d(o)) }.toDF("lid", "ld")
      .createOrReplaceTempView("dl")
    rRows.map { case (id, o) => (id, d(o)) }.toDF("rid", "rd")
      .createOrReplaceTempView("dr")
    val q = sp.sql(
      "SELECT lid, rid FROM dl JOIN dr ON ld BETWEEN rd - 3 AND rd + 3")
    val plan = physical(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"DATE band still plans the quadratic join:\n$plan")
    assert(plan.contains("__graft_band"), s"did not fire:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lid, lo) <- lRows; (rid, ro) <- rRows
      if math.abs(lo - ro) <= 3
    } yield (lid, rid)).toSet
    assert(got === want)
  }

  test("year-month intervals are NOT linearized (calendar arithmetic)") {
    val sp = s; import sp.implicits._
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-31 00:00:00")))
      .toDF("lid", "lt").createOrReplaceTempView("ml")
    Seq((10L, java.sql.Timestamp.valueOf("2024-02-29 00:00:00")))
      .toDF("rid", "rt").createOrReplaceTempView("mr")
    val q = sp.sql("""SELECT lid, rid FROM ml JOIN mr
      ON lt BETWEEN rt - INTERVAL '1' MONTH AND rt + INTERVAL '1' MONTH""")
    // month lengths vary — banding would be approximate; the rule must
    // leave the plan alone and the (tiny-dim) calendar answer stand
    assert(!physical(q).contains("__graft_band"),
      s"rule linearized a calendar interval:\n${physical(q)}")
    assert(q.count() === 1L)
  }

  test("random TIMESTAMP data: banded result identical to the raw predicate") {
    val sp = s; import sp.implicits._
    def check(p: Prop, n: Int): Unit = {
      val r = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default
          .withMinSuccessfulTests(n).withWorkers(1), p)
      assert(r.passed, r.status.toString)
    }
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
    val secGen = Gen.chooseNum(-4000L, 4000L)
    check(Prop.forAllNoShrink(
      Gen.zip(Gen.listOfN(25, secGen), Gen.listOfN(18, secGen),
        Gen.chooseNum(1L, 900L))) {
      case (ls, rs, bandSec) =>
        val left = ls.zipWithIndex.map { case (t, i) =>
          (i.toLong, new java.sql.Timestamp(base + t * 1000L)) }
          .toDF("lid", "lt")
        val right = rs.zipWithIndex.map { case (t, i) =>
          (i.toLong, new java.sql.Timestamp(base + t * 1000L)) }
          .toDF("rid", "rt")
        left.createOrReplaceTempView("pl"); right.createOrReplaceTempView("pr")
        val q = sp.sql(s"""SELECT lid, rid FROM pl JOIN pr
          ON lt BETWEEN pr.rt - INTERVAL '$bandSec' SECOND
                    AND pr.rt + INTERVAL '$bandSec' SECOND""")
        val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (lt, li) <- ls.zipWithIndex; (rt, ri) <- rs.zipWithIndex
          if math.abs(lt - rt) <= bandSec
        } yield (li.toLong, ri.toLong)).toSet
        Prop(got == want)
    }, 12)
  }

  test("joins with an equi key are left alone") {
    val sp = s; import sp.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lt", "lv")
    val right = Seq((1L, 12L, 200L)).toDF("rk", "rt", "rv")
    val q = left.join(right,
      $"k" === $"rk" && $"rt" >= $"lt" - 5L && $"rt" <= $"lt" + 5L)
    assert(!physical(q).contains("__graft_band"),
      s"rule fired despite equi key:\n${physical(q)}")
    assert(q.count() === 1L)
  }

  test("streaming joins are left alone (state-store execution owns them)") {
    val sp = s; import sp.implicits._
    val left = sp.readStream.format("rate").option("rowsPerSecond", "1")
      .load().select($"value".as("lt"), $"value".as("lid"))
    val right = sp.readStream.format("rate").option("rowsPerSecond", "1")
      .load().select($"value".as("rt"), $"value".as("rid"))
    val q = left.join(right, $"rt" - $"lt" >= -3L && $"rt" - $"lt" <= 5L)
    // batch execution of a streaming plan is rejected upstream, so
    // apply the rule DIRECTLY to the analyzed streaming plan — it must
    // be the identity there
    val analyzed = q.queryExecution.analyzed
    val rewritten = RangeJoinBandingRule(analyzed)
    assert(rewritten eq analyzed,
      s"rule fired on a stream-stream join:\n$rewritten")
  }

  test("random data: banded result identical to the raw predicate") {
    val sp = s; import sp.implicits._
    def check(p: Prop, n: Int): Unit = {
      val r = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default
          .withMinSuccessfulTests(n).withWorkers(1), p)
      assert(r.passed, r.status.toString)
    }
    val tsGen = Gen.chooseNum(-40L, 40L)
    val boundsGen = for {
      a <- Gen.chooseNum(-12L, 12L); b <- Gen.chooseNum(-12L, 12L)
    } yield (math.min(a, b), math.max(a, b))
    check(Prop.forAllNoShrink(
      Gen.zip(Gen.listOfN(30, tsGen), Gen.listOfN(20, tsGen), boundsGen)) {
      case (ls, rs, (lo, hi)) =>
        val left = ls.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("lid", "lt")
        val right = rs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("rid", "rt")
        val q = left.join(right, $"rt" - $"lt" >= lo && $"rt" - $"lt" <= hi)
        val got = q.select($"lid", $"rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (lt, li) <- ls.zipWithIndex
          (rt, ri) <- rs.zipWithIndex
          if rt - lt >= lo && rt - lt <= hi
        } yield (li.toLong, ri.toLong)).toSet
        Prop(got == want)
    }, 15)
  }
}
