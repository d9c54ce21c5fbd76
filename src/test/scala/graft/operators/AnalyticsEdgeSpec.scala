package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-input behavior of the round-7 analytics operators: empty
  * frames, singletons, and degenerate parameters must produce sound
  * (not just non-crashing) results.
  */
class AnalyticsEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("simhashPairs: empty corpus and single doc produce no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.simhashPairs(empty, "doc_id", "text").count() === 0L)
    val one = Seq((1L, "only doc here")).toDF("doc_id", "text")
    assert(TextDedup.simhashPairs(one, "doc_id", "text").count() === 0L)
  }

  test("simhashPairs: identical docs pair at hamming 0") {
    val df = Seq((1L, "same text twice"), (2L, "same text twice"))
      .toDF("doc_id", "text")
    val rows = TextDedup.simhashPairs(df, "doc_id", "text").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 2L, 0L)))
  }

  test("simhashPairs rejects maxHamming above the banding guarantee") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextDedup.simhashPairs(df, "doc_id", "text", maxHamming = 4)
    }
  }

  test("heavy hitters: empty input and k=1 behave") {
    val empty = Seq.empty[String].toDF("item")
    assert(HeavyHitters.mgCandidates(empty, "item", 5).isEmpty)
    assert(HeavyHitters.frequentItems(empty, "item", 5, 1L).count() === 0L)
    // k=1: candidates hold at most one item; the majority item survives
    val maj = (Seq.fill(7)("x") ++ Seq("a", "b", "c")).toDF("item")
    val got = HeavyHitters.frequentItems(maj, "item", 1, 6L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("x", 7L)))
  }

  test("heavy hitters: minCount inside the MG bound fails fast") {
    val df = Seq.fill(100)("x").toDF("item")
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", 4, 10L) // bound = 100/5 = 20
    }
  }

  test("sessionize: single event per user is session 1 with 0 duration") {
    val df = Seq((1L, 100L, 0L), (2L, 900L, 1L))
      .toDF("user_id", "us", "event_id")
    val s = Sessionize.sessions(df, "user_id", "us", "event_id", gap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5))).sortBy(_._1)
    assert(s.toSeq === Seq((1L, 1L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("sessionize: boundary gap keeps the session, gap+1 splits it") {
    val df = Seq((1L, 0L, 0L), (1L, 10L, 1L), (1L, 21L, 2L))
      .toDF("user_id", "us", "event_id")
    val idx = Sessionize.assign(df, "user_id", "us", "event_id", gap = 10L)
      .orderBy("us").select("session_idx").as[Long].collect()
    assert(idx.toSeq === Seq(1L, 1L, 2L))
  }

  test("triangles: empty graph, self-loops, duplicate edges normalize") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val r0 = Triangles.census(empty, "src", "dst").collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) === ((0L, 0L, 0L)))
    // K3 with noise: loops, both directions, repeats
    val k3 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
      .toDF("src", "dst")
    val r = Triangles.census(k3, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 1L)))
  }

  test("triangles: IntegerType ids pack without collisions") {
    // open wedge (1-2, 1-3), ints: the pre-fix packed key degraded to
    // bitwise OR on int columns (2|3 == 1|2 == 3), faking a triangle
    val wedge = Seq((1, 2), (1, 3)).toDF("src", "dst")
    val r = Triangles.census(wedge, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 0L)))
  }

  test("bm25TopK: absent terms yield empty; k caps the result") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    assert(InvertedIndex.bm25TopK(docs, "doc_id", "text",
      Seq("nosuchterm"), 5).count() === 0L)
    assert(InvertedIndex.bm25TopK(docs, "doc_id", "text",
      Seq("beta"), 1).count() === 1L)
  }
}
