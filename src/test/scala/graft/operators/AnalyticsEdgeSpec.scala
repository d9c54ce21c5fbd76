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

  test("rolling anomaly: constant stream silent, spike flagged, zero-variance deviation flagged") {
    // user 1: constant — never anomalous (nv = s exactly);
    // user 2: steady 100s then a 200 spike at t=9 (window var 0 → ANY
    //         deviation flags), then back to steady;
    // the first minWindow rows can never flag (too few predecessors)
    val rows = (1 to 10).map(t => (1L, t.toLong, t.toLong, 100L)) ++
      (1 to 10).map(t => (2L, t.toLong, t.toLong, if (t == 9) 200L else 100L))
    val df = rows.toDF("user_id", "ts", "tie", "vc")
    val got = RollingAnomaly.anomalies(df, "user_id", "ts", "tie", "vc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 9L)))
  }

  test("rolling anomaly: mild wobble inside 3 sigma stays silent") {
    // alternating 100/102: sigma = 1 around mean 101; a 102 is 1 sigma
    val rows = (1 to 12).map(t =>
      (1L, t.toLong, t.toLong, if (t % 2 == 0) 102L else 100L))
    val got = RollingAnomaly.anomalies(rows.toDF("user_id", "ts", "tie", "vc"),
      "user_id", "ts", "tie", "vc").count()
    assert(got === 0L)
  }

  test("changepoint: level shift located at the last pre-shift row; singles absent") {
    // user 1: 10 rows of 100 then 10 rows of 200 — the scaled cusum
    // |n·prefix_k − k·S| peaks exactly at k = 10 (the boundary);
    // user 2: single row — no proper prefix, absent from the output
    val rows = (1 to 20).map(t =>
      (1L, t.toLong, t.toLong, if (t <= 10) 100L else 200L)) :+
      (2L, 1L, 1L, 500L)
    val got = Changepoint.cusumPeak(rows.toDF("user_id", "ts", "tie", "vc"),
        "user_id", "ts", "tie", "vc")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // at k=10: |20·1000 − 10·3000| = 10000, the maximum
    assert(got === Map(1L -> ((10L, 10L, 10000L, 20L))))
  }

  test("sequential cusum alarm: hand-traced chart, first crossing, no-alarm NULLs") {
    // key A: values 5,5,20,20,5 with slack 10 → S = 0,0,10,20,15;
    // threshold 15 first crossed at i=4 (ts 4); max_s = 20.
    // key B: all values at slack → S stays 0, no alarm (NULL ts/index)
    val rows = Seq(("A", 1L, 5L), ("A", 2L, 5L), ("A", 3L, 20L),
      ("A", 4L, 20L), ("A", 5L, 5L),
      ("B", 1L, 10L), ("B", 2L, 10L))
    val got = Changepoint.cusumAlarm(rows.toDF("k", "ts", "v"),
        "k", "ts", "v", slack = 10L, threshold = 15L)
      .orderBy(col("k")).collect()
    assert(got(0).getLong(1) === 5L && got(0).getLong(2) === 20L &&
      got(0).getLong(3) === 4L && got(0).getLong(4) === 4L)
    assert(got(1).getLong(1) === 2L && got(1).getLong(2) === 0L &&
      got(1).isNullAt(3) && got(1).isNullAt(4))
  }

  test("per-node triangle census: clique + pendant coefficients, 3x corner credit") {
    // 4-clique {1..4} plus pendant 5 hanging off node 4: clique nodes
    // 1-3 sit in 3 triangles over deg 3 (coefficient 1.0); node 4 has
    // deg 4 with the same 3 triangles (2·3/(4·3) = 0.5); pendant deg 1
    val edges = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toSeq :+ (4L, 5L)
    val got = Triangles.perNodeCensus(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((3L, 3L, 1000000L)))
    assert(got(2L) === ((3L, 3L, 1000000L)))
    assert(got(3L) === ((3L, 3L, 1000000L)))
    assert(got(4L) === ((4L, 3L, 500000L)))
    assert(got(5L) === ((1L, 0L, 0L)))
    // corner-credit invariant vs the global census: Σ per-node = 3·T
    val total = Triangles.census(edges.toDF("src", "dst"), "src", "dst")
      .collect()(0).getLong(2)
    assert(got.values.map(_._2).sum === 3 * total)
  }

  test("bm25TopKBatch equals per-query bm25TopK on the same term sets") {
    val docs = Seq(
      (1L, "merge the merge queue with vector clocks"),
      (2L, "vector search over a stream of vector embeddings"),
      (3L, "plain prose with none of the query words"),
      (4L, "stream stream stream merge"),
      (5L, "a very long document about merge " + ("filler " * 40).trim))
      .toDF("doc_id", "text")
    val querySets = Map(10L -> Seq("merge", "vector"),
      11L -> Seq("stream"), 12L -> Seq("nosuchterm"))
    val qterms = querySets.toSeq
      .flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
    val batch = InvertedIndex.bm25TopKBatch(docs, "doc_id", "text",
        qterms, "query_id", "term", k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val single = querySets.toSeq.flatMap { case (q, ts) =>
      InvertedIndex.bm25TopK(docs, "doc_id", "text", ts, k = 10)
        .collect().zipWithIndex
        .map { case (r, i) =>
          (q, i + 1L) -> (r.getLong(0), r.getLong(1), r.getDouble(2)) }
    }.toMap
    assert(batch === single)
    spark.catalog.clearCache()
  }

  test("changepoint: constant series ties break to the earliest row") {
    val rows = (1 to 5).map(t => (1L, t.toLong, t.toLong, 7L))
    val got = Changepoint.cusumPeak(rows.toDF("user_id", "ts", "tie", "vc"),
        "user_id", "ts", "tie", "vc").collect()
    assert(got.length === 1)
    // every prefix cusum is 0 → argmax ties → earliest (k = 1)
    assert(got(0).getLong(2) === 1L && got(0).getLong(3) === 0L)
  }
}
