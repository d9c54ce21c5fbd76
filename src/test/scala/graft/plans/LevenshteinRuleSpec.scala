package graft.plans

import graft.SparkSpec

/** Pins [[LevenshteinThresholdRule]]: the rewrite fires on every
  * bounded-predicate shape, preserves results exactly (incl. NULLs
  * and the k=0 edge), and leaves other predicates alone.
  *
  * Registered here through `experimental.extraOptimizations` (the
  * public per-session hook — the shared test JVM may already hold a
  * session, so `withExtensions` can't be exercised end-to-end;
  * ComponentsSpec covers the `GraftExtensions` injection path).
  * The rule is idempotent and semantics-preserving, so leaving it in
  * the shared session is safe.
  */
class LevenshteinRuleSpec extends SparkSpec {

  private lazy val withRule = {
    if (!spark.experimental.extraOptimizations.contains(LevenshteinThresholdRule))
      spark.experimental.extraOptimizations ++= Seq(LevenshteinThresholdRule)
    spark
  }

  // parquet round-trip: a LocalRelation of literals would be
  // constant-folded (ConvertToLocalRelation) before ANY optimizer
  // rule could see the levenshtein predicate
  private lazy val df = {
    val s = withRule
    import s.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("levrule").resolve("t").toString
    Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
      ("a", "abcdefgh"), (null, "x"), ("y", null))
      .toDF("a", "b").write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  test("<= k rewrites to the banded form and keeps results exact") {
    val q = df.filter("levenshtein(a, b) <= 2")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains(") >= 0"), s"banded form missing in:\n$plan")
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("abc", "abd"), ("same", "same")))
  }

  test("< k, reversed operands, and k=0 all rewrite; results match") {
    val shapes = Seq(
      "levenshtein(a, b) < 3" -> Set(("abc", "abd"), ("same", "same")),
      "3 >= levenshtein(a, b)" -> Set(("kitten", "sitting"),
        ("abc", "abd"), ("same", "same")),
      "1 > levenshtein(a, b)" -> Set(("same", "same")),
      "levenshtein(a, b) <= 0" -> Set(("same", "same")))
    for ((pred, expect) <- shapes) {
      val q = df.filter(pred)
      assert(q.queryExecution.optimizedPlan.toString.contains(") >= 0"),
        s"no rewrite for: $pred")
      assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet
        === expect, s"wrong rows for: $pred")
    }
    // NULL operands drop on both paths (predicate is NULL, not true)
    assert(!df.filter("levenshtein(a, b) <= 99")
      .collect().exists(r => r.isNullAt(0) || r.isNullAt(1)))
  }

  test("non-literal and unbounded comparisons are left untouched") {
    val q1 = df.filter("levenshtein(a, b) >= 2") // lower bound: no band
    assert(!q1.queryExecution.optimizedPlan.toString.contains(") >= 0"))
    assert(q1.count() === 2) // kitten/sitting (3) and a/abcdefgh (7)
    val q2 = df.filter("levenshtein(a, b) <= length(b)") // non-literal k
    assert(!q2.queryExecution.optimizedPlan.toString.contains(">= 0"))
    assert(q2.count() === 4)
  }
}
