package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}

/** Pins the native [[AsofJoinExec]]: plan shape (one merge pass, no
  * union/window), result equality with the declarative
  * [[graft.operators.TemporalJoins.asofJoin]] face, and an in-memory
  * reference on randomized data.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(r.passed, r.status.toString)
  }

  test("hand case: latest at-or-before wins; same-instant visible; no-match null") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 50L, "d"), (3L, 7L, "e")).toDF("k", "lt", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 60L, "r60"))
      .toDF("rk", "rt", "rv")
    val got = AsofJoinNative.asof(left, right, Seq("k"), Seq("rk"),
        "lt", "rt")
      .select(col("k"), col("lt"), col("lv"), col("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getString(3)))).toMap
    assert(got === Map(
      (1L, 10L) -> Some("r10"), // same-instant right IS visible
      (1L, 20L) -> Some("r15"), // latest at-or-before
      (1L, 5L) -> None, // before any right row
      (2L, 50L) -> None, // right exists but only later
      (3L, 7L) -> None)) // key absent on the right
  }

  test("plan: AsofJoinExec with sorted co-clustered children, no window/union") {
    val left = (1 to 100).map(i => (i.toLong % 7, i.toLong * 3, i))
      .toDF("k", "lt", "lv")
    val right = (1 to 50).map(i => (i.toLong % 7, i.toLong * 5, s"v$i"))
      .toDF("rk", "rt", "rv")
    val q = AsofJoinNative.asof(left, right, Seq("k"), Seq("rk"), "lt", "rt")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"exec node missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"declarative fallback shape leaked into:\n$plan")
    // the merge output is usable downstream (agg over the join result)
    assert(q.groupBy(col("k")).count().collect().map(_.getLong(1)).sum === 100)
  }

  test("non-nullable right columns are NULL on no-match rows") {
    // Seq.toDF longs are NON-nullable — binding the output projection
    // against the children's raw schema would skip null checks and emit
    // 0 instead of NULL on unmatched left rows (the ADVICE r9 high bug)
    val left = Seq((1L, 5L), (2L, 50L)).toDF("k", "lt")
    val right = Seq((1L, 10L, 7L), (2L, 40L, 9L)).toDF("rk", "rt", "rv")
    assert(!right.schema("rv").nullable, "fixture must be non-nullable")
    val got = AsofJoinNative.asof(left, right, Seq("k"), Seq("rk"),
        "lt", "rt")
      .select(col("k"), col("rv"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(
      1L -> None, // no right row at-or-before: NULL, not 0
      2L -> Some(9L)))
  }

  test("NULL keys and NULL times never match (SQL join equality)") {
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (null, 10L, "lnullk"), (1L, null, "lnullt"), (1L, 20L, "lok"))
      .toDF("k", "lt", "lv")
    val right = Seq[(java.lang.Long, java.lang.Long, String)](
      (null, 5L, "rnullk"), // null right key: never a match, even vs null left key
      (1L, null, "rnullt"), // null right time: never a match
      (1L, 15L, "r15")).toDF("rk", "rt", "rv")
    val got = AsofJoinNative.asof(left, right, Seq("k"), Seq("rk"),
        "lt", "rt")
      .select(col("lv"), col("rv"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(got === Map(
      "lnullk" -> None, // null left key matches nothing
      "lnullt" -> None, // null left time matches nothing
      "lok" -> Some("r15")))
  }

  test("forward as-of: earliest at-or-after via time negation, random pin") {
    val leftGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 25L)))
    val rightGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 25L)))
    check(Prop.forAllNoShrink(Gen.zip(leftGen, rightGen)) {
      case (ls0, rs0) =>
        val ls = ls0.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        val rs = rs0.distinct.map { case (k, t) => (k, t, s"v${k}_$t") }
        val left = ls.toDF("k", "lt", "lid")
        val right = rs.toDF("k", "rt", "rv")
        val got = graft.operators.TemporalJoins
          .asofJoinForward(left, right, Seq("k"), "lt", "rt", Seq("rv"))
          .select(col("lid"), col("rv"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
        val model = ls.map { case (k, lt, lid) =>
          val cand = rs.filter(r => r._1 == k && r._2 >= lt)
          lid -> (if (cand.isEmpty) None else Some(cand.minBy(_._2)._3))
        }.toMap
        Prop(got == model)
    }, 15)
  }

  test("nearest as-of: closest match either direction, ties backward") {
    val leftGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 25L)))
    val rightGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 25L)))
    check(Prop.forAllNoShrink(Gen.zip(leftGen, rightGen)) {
      case (ls0, rs0) =>
        val ls = ls0.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        val rs = rs0.distinct.map { case (k, t) => (k, t, s"v${k}_$t") }
        val left = ls.toDF("k", "lt", "lid")
        val right = rs.toDF("k", "rt", "rv")
        val got = graft.operators.TemporalJoins
          .asofJoinNearest(left, right, Seq("k"), "lt", "rt", Seq("rv"))
          .select(col("lid"), col("rv"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
        val model = ls.map { case (k, lt, lid) =>
          val cand = rs.filter(_._1 == k)
          lid -> (if (cand.isEmpty) None else {
            // min |Δ|, ties to the at-or-before side, then its max rt
            // (backward = latest at-or-before; forward = earliest after)
            val best = cand.minBy(r =>
              (math.abs(r._2 - lt), if (r._2 <= lt) 0 else 1,
                if (r._2 <= lt) -r._2 else r._2))
            Some(best._3)
          })
        }.toMap
        Prop(got == model)
    }, 15)
  }

  test("TIMESTAMP columns dispatch to the native exec and match the windowed face") {
    def ts(min: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 50L, "d"), (3L, 7L, "e"))
      .map { case (k, m, v) => (k, ts(m), v) }.toDF("k", "lt", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 60L, "r60"))
      .map { case (k, m, v) => (k, ts(m), v) }.toDF("k", "rt", "rv")
    val q = graft.operators.TemporalJoins
      .asofJoin(left, right, Seq("k"), "lt", "rt", Seq("rv"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"),
      s"TIMESTAMP inputs missed the native exec:\n$plan")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lv"), col("rv")).collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(res(q) === Map("a" -> Some("r10"), "b" -> Some("r15"),
      "c" -> None, "d" -> None, "e" -> None))
    assert(res(q) === res(graft.operators.TemporalJoins
      .asofJoinWindowed(left, right, Seq("k"), "lt", "rt", Seq("rv"))))
    // output schema keeps the original TIMESTAMP column, no helper cols
    assert(q.columns.toSeq === Seq("k", "lt", "lv", "rv"))
  }

  test("DATE columns dispatch natively; forward/nearest accept TIMESTAMP") {
    def d(off: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(off).toString)
    val left = Seq((1L, 5, "a"), (1L, 9, "b"), (2L, 2, "c"))
      .map { case (k, o, v) => (k, d(o), v) }.toDF("k", "ld", "lv")
    val right = Seq((1L, 4, "r4"), (1L, 8, "r8"), (2L, 6, "r6"))
      .map { case (k, o, v) => (k, d(o), v) }.toDF("k", "rd", "rv")
    val q = graft.operators.TemporalJoins
      .asofJoin(left, right, Seq("k"), "ld", "rd", Seq("rv"))
    assert(q.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val got = q.select(col("lv"), col("rv")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(got === Map("a" -> Some("r4"), "b" -> Some("r8"), "c" -> None))
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val lts = Seq((1L, 10L, "x"), (1L, 30L, "y"))
      .map { case (k, m, v) => (k, ts(m), v) }.toDF("k", "lt", "lv")
    val rts = Seq((1L, 12L, "r12"), (1L, 25L, "r25"))
      .map { case (k, m, v) => (k, ts(m), v) }.toDF("k", "rt", "rv")
    val fwd = graft.operators.TemporalJoins
      .asofJoinForward(lts, rts, Seq("k"), "lt", "rt", Seq("rv"))
      .select(col("lv"), col("rv")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(fwd === Map("x" -> Some("r12"), "y" -> None))
    val near = graft.operators.TemporalJoins
      .asofJoinNearest(lts, rts, Seq("k"), "lt", "rt", Seq("rv"))
      .select(col("lv"), col("rv")).collect()
      .map(r => r.getString(0) -> Some(r.getString(1))).toMap
    assert(near === Map("x" -> Some("r12"), "y" -> Some("r25")))
  }

  test("random data: equals the declarative face and an in-memory model") {
    val leftGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 25L)))
    val rightGen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 25L)))
    check(Prop.forAllNoShrink(Gen.zip(leftGen, rightGen)) {
      case (ls0, rs0) =>
        val ls = ls0.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        // unique (key, time) on the right — the as-of contract
        val rs = rs0.distinct.map { case (k, t) => (k, t, s"v${k}_$t") }
        val left = ls.toDF("k", "lt", "lid")
        val right = rs.toDF("rk", "rt", "rv")
        val native = AsofJoinNative
          .asof(left, right, Seq("k"), Seq("rk"), "lt", "rt")
          .select(col("lid"), col("rv"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
        val model = ls.map { case (k, lt, lid) =>
          val cand = rs.filter(r => r._1 == k && r._2 <= lt)
          lid -> (if (cand.isEmpty) None
            else Some(cand.maxBy(_._2)._3))
        }.toMap
        val declarative = graft.operators.TemporalJoins
          .asofJoinWindowed(left, right.withColumnRenamed("rk", "k"), Seq("k"),
            "lt", "rt", Seq("rv"))
          .select(col("lid"), col("rv"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
        Prop(native == model && declarative == model)
    }, 20)
  }
}
