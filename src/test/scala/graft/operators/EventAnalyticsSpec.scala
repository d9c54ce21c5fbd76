package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Funnel]], [[TimeWeighted]] and [[Keyness]] against
  * hand-computed references on adversarial minimal inputs.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts): u1 converts fully in order; u2 has the purchase
  // BEFORE the click (must stall at click); u3 views only; u4 starts
  // at click (never enters the funnel — no view)
  private val ev = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
    (3L, "view", 5L),
    (4L, "click", 7L), (4L, "purchase", 9L)
  ).toDF("u", "t", "ts")

  test("funnel: strict order, stalls, and non-entrants") {
    val got = Funnel.stageCounts(ev, "u", "t", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (0, "view", 3L, 1000000L),     // u1,u2,u3
      (1, "click", 2L, 666666L),     // u1,u2 (u2's click is after view)
      (2, "purchase", 1L, 500000L))) // only u1: u2 purchased pre-click
  }

  test("funnel: same-timestamp stage events do NOT advance (strict >)") {
    val tied = Seq((1L, "view", 10L), (1L, "click", 10L)).toDF("u", "t", "ts")
    val got = Funnel.stageCounts(tied, "u", "t", "ts", Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got === Seq((0, 1L), (1, 0L)))
  }

  test("funnel: empty stage yields 0 with conv_ppm 0, not a crash") {
    val got = Funnel.stageCounts(ev, "u", "t", "ts",
        Seq("view", "signup", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0, 3L, 1000000L), (1, 0L, 0L), (2, 0L, 0L)))
  }

  test("TWA: interval weighting beats burst sampling; last event weightless") {
    // key 1: value 10 held for 90 µs then 100 held for 10 µs → 19.0;
    // the 100-burst (3 samples in 0 extra time) must not triple-count
    val e = Seq((1L, 0L, 10.0), (1L, 90L, 100.0), (1L, 95L, 100.0),
      (1L, 100L, 777.0), // last event: value never current
      (2L, 0L, 5.0)      // single event: dropped entirely
    ).toDF("k", "us", "v")
    val got = TimeWeighted.twa(e, "k", "us", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 4L, 100L,
      (10.0 * 90 + 100.0 * 5 + 100.0 * 5) / 100.0))) // = 19.0
  }

  test("TWA equals the plain mean when sampling is uniform") {
    val e = (0 until 10).map(i => (1L, i * 7L, (i % 3).toDouble + 1))
      .toDF("k", "us", "v")
    val got = TimeWeighted.twa(e, "k", "us", "v").collect().head
    // uniform gaps → TWA = mean of the first 9 values (last is weightless)
    val expect = (0 until 9).map(i => (i % 3).toDouble + 1).sum / 9
    assert(math.abs(got.getDouble(3) - expect) < 1e-9)
    assert(got.getLong(2) === 63L)
  }

  test("keyness: planted exclusive term tops its group; shared term does not") {
    val docs = Seq(
      ("a", Seq("zebra", "common", "common")),
      ("a", Seq("zebra", "common")),
      ("b", Seq("common", "common", "yak")),
      ("b", Seq("common", "yak", "yak"))
    ).toDF("grp", "toks")
    val got = Keyness.topDistinctive(docs, "grp", "toks", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.filter(_._1 == "a").map(_._3).head === "zebra")
    assert(got.filter(_._1 == "b").map(_._3).head === "yak")
    // z antisymmetry with two groups: a term present in BOTH scores
    // z and -z (the operator scores only groups where a term occurs)
    val all = Keyness.topDistinctive(docs, "grp", "toks", k = 10)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getDouble(5))
      .toMap
    assert(math.abs(all(("a", "common")) + all(("b", "common"))) < 2e-6)
  }

  test("scene segments: cuts at L1 jumps, jitter below threshold ignored") {
    import Multimodal.VideoFrame
    // frames: two stable shots with ±1 jitter, a hard cut at frame 3
    val frames = Seq(
      VideoFrame(7L, 0, 4, 4, 100, 100, 100),
      VideoFrame(7L, 1, 4, 4, 101, 100, 99), // L1=3: same shot
      VideoFrame(7L, 2, 4, 4, 100, 100, 100),
      VideoFrame(7L, 3, 4, 4, 10, 200, 100), // L1=190: cut
      VideoFrame(7L, 4, 4, 4, 11, 200, 100),
      VideoFrame(9L, 0, 4, 4, 5, 5, 5)       // second media: one scene
    ).toDS()
    val got = Multimodal.sceneSegments(frames, threshold = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((7L, 1L, 0L, 2L, 3L), (7L, 2L, 3L, 4L, 2L),
      (9L, 1L, 0L, 0L, 1L)))
  }

  test("scene segments survive a REAL AVI decode round-trip") {
    val colors = Seq((10, 10, 10), (11, 10, 10), (200, 50, 50), (201, 50, 50))
    val rec = Seq(Multimodal.MediaRecord(3L, "video",
      Multimodal.solidAvi(16, 8, 10, colors))).toDS()
    val got = Multimodal.sceneSegments(
        Multimodal.videoFrameFeatures(rec, stride = 1), threshold = 30)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 0L, 1L), (2L, 2L, 3L)))
  }
}
