package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins the deterministic-sampling operators ([[Sampling]]): the hash
  * bucket must be engine-invariant (re-derivable from md5 outside
  * Spark), the stratified filter row-local, and the quota cap exactly
  * the N smallest rows per group.
  */
class SamplingSpec extends SparkSpec {

  private def md5Permille(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    // first 8 hex digits = first 4 bytes, big-endian, unsigned
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % 1000
  }

  test("hashPermille matches an independent JVM md5 derivation") {
    val rows = spark.range(0, 500).select(col("id"),
        Sampling.hashPermille(col("id")).as("pm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    rows.foreach { case (id, pm) => assert(pm === md5Permille(id), s"id=$id") }
  }

  test("stratifiedHashSample keeps exactly the rows under the stratum rate") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val kept = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
        Map("en" -> 300), defaultPermille = 900)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, lang) =>
        md5Permille(id) < (if (lang == "en") 300 else 900) }
      .toSet
    assert(kept === expected)
    // determinism: a second run returns the identical set
    val again = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
        Map("en" -> 300), defaultPermille = 900)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === kept)
  }

  test("groupQuotaCap keeps exactly the N smallest rows per group") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("source"))
    val capped = Sampling.groupQuotaCap(docs, Seq("source"),
        Seq(col("doc_id")), maxPerGroup = 8)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val bySource = capped.groupBy(_._1)
    assert(bySource.values.forall(_.length <= 8))
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.map(_._1).sorted.take(8).zipWithIndex
          .map { case (id, i) => (src, id, (i + 1).toLong) } }.toSet
    assert(capped.toSet === expected)
  }

  test("tokenBudgetMix matches a sequential per-source prefix model") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = (0 until 60).toList.map(i =>
      (i.toLong, s"s${i % 4}", (5 + i % 7).toLong)) // sources s0..s3
    val weights = Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2) // s3 dropped
    val total = 120L
    val got = Sampling.tokenBudgetMix(
        rows.toDF("id", "src", "toks"), "id", "src", "toks", weights, total)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
    val wSum = weights.values.sum
    val expected = rows.filter(r => weights.contains(r._2))
      .groupBy(_._2).flatMap { case (src, docs) =>
        val budget = math.floor(weights(src) / wSum * total).toLong
        val ordered = docs.sortBy(d => (md5hex(d._1.toString), d._1))
        ordered.scanLeft(0L)((acc, d) => acc + d._3).zip(ordered)
          .filter { case (before, _) => before < budget }
          .map { case (before, d) => (d._1, src, before) }
      }.toSet
    assert(got === expected)
    // every weighted source is present and under budget + one boundary doc
    assert(got.map(_._2) === Set("s0", "s1", "s2"))
  }

  test("weightedPrioritySample matches an independent JVM key derivation") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i, 0.05 + (i % 7) * 0.15))
    val got = Sampling.weightedPrioritySample(
        rows.toDF("id", "w"), "id", "w", k = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    // independent reimplementation: md5 -> h48 -> u -> round(ln(u)/w, 6)
    def lkey(id: Long, w: Double): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = d.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val u = (h + 1).toDouble / 281474976710657.0
      java.math.BigDecimal.valueOf(math.log(u) / w)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    rows.foreach { case (id, w) => assert(got(id)._1 === lkey(id, w), s"id=$id") }
    val expectedOrder = rows.sortBy { case (id, w) => (-lkey(id, w), id) }.map(_._1)
    expectedOrder.zipWithIndex.foreach { case (id, i) =>
      assert(got(id)._2 === i + 1L, s"rank of $id") }
    assert(got.values.count(_._3) === 10)
    assert(got.filter(_._2._3).keySet === expectedOrder.take(10).toSet)
  }

  test("DSIR: target-like docs outrank off-domain docs; rank/quota exact") {
    import spark.implicits._
    // target slice is database-themed; raw pool mixes db-themed docs
    // with fruit-themed ones — DSIR must pull the db-themed ones first
    val docs = Seq(
      (0L, "query plan join scan", true),
      (1L, "join scan filter plan", true),
      (2L, "query join plan scan filter", false),
      (3L, "scan plan query join", false),
      (4L, "apple banana cherry mango", false),
      (5L, "mango banana apple pear", false),
      (6L, "plan scan join query filter scan", false),
      (7L, "pear cherry mango banana apple", false)
    ).toDF("doc_id", "text", "tgt")
    val got = Dsir.importanceResample(docs, "doc_id", "text", col("tgt"),
        numBuckets = 32, keepFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet === Set(2L, 3L, 4L, 5L, 6L, 7L))
    // sel_rank is a 1..n permutation consistent with (weight desc, id)
    val byRank = got.toSeq.sortBy(_._2._2)
    assert(byRank.map(_._2._2) === (1L to 6L))
    byRank.sliding(2).foreach { case Seq((ia, (wa, _, _)), (ib, (wb, _, _))) =>
      assert(wa > wb || (wa == wb && ia < ib)) }
    // quota = ceil(0.5 * 6) = 3, and the db-themed docs are the winners
    assert(got.filter(_._2._3).keySet === Set(2L, 3L, 6L))
    got.filterNot(_._2._3).keySet.foreach(id => assert(Set(4L, 5L, 7L)(id)))
    // db-themed weights strictly above fruit-themed ones
    val dbMin = Seq(2L, 3L, 6L).map(got(_)._1).min
    val fruitMax = Seq(4L, 5L, 7L).map(got(_)._1).max
    assert(dbMin > fruitMax)
  }
  test("temperatureHalfWeights: rare source up-samples, ppm and sums exact") {
    // masses 90 / 10: p_ppm = 900000 / 100000
    // u = round(sqrt(900000),6) = 948.683298, round(sqrt(100000),6)
    //   = 316.227766; weights = u / (u1+u2) -> 0.75 / 0.25
    import spark.implicits._
    val df = (Seq.fill(9)(("big", 10L)) ++ Seq(("small", 10L)))
      .toDF("source", "chars")
    val got = graft.operators.Sampling.temperatureHalfWeights(
        df, "source", "chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val u1 = BigDecimal(math.sqrt(900000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val u2 = BigDecimal(math.sqrt(100000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def w(u: BigDecimal) = BigDecimal(u.toDouble / (u1 + u2).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      ("big", 9L, 90L, 900000L, w(u1)),
      ("small", 1L, 10L, 100000L, w(u2))))
    // the raw 9:1 imbalance compresses to 3:1 under T=2
    assert(got.head._5 === 0.75 && got.last._5 === 0.25)
  }

  test("chunkByTokens: overlap, suffix window, singleton, empty doc drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, max 3 stride 2 → starts 0,2,4,6
      (2L, "X"),             // 1 token (lowercased) → one 1-token chunk
      (3L, "   "),           // zero tokens → no chunks
      (4L, "p q r"))         // exactly max → one full chunk (stride 2 → 0,2)
      .toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text",
        maxTokens = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 0L, 3L, "a b c"),
      (1L, 2L, 2L, 3L, "c d e"),
      (1L, 3L, 4L, 3L, "e f g"),
      (1L, 4L, 6L, 1L, "g"),
      (2L, 1L, 0L, 1L, "x"),
      (4L, 1L, 0L, 3L, "p q r"),
      (4L, 2L, 2L, 1L, "r")))
    // non-overlapping chunks (stride = max) tile the doc exactly
    val tiled = Chunking.chunkByTokens(docs.filter($"doc_id" === 1L),
        "doc_id", "text", maxTokens = 3, stride = 3)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(tiled.map(_._5).mkString(" ") === "a b c d e f g")
  }

  test("windowDupRate: planted boilerplate flags across docs AND sources") {
    import spark.implicits._
    // 2-token windows; "tpl tpl" opens three docs in two sources (the
    // cross-doc template doc-level dedup can't see); everything else
    // unique
    val docs = Seq(
      (1L, "s1", "tpl tpl u1 u2"),
      (2L, "s1", "tpl tpl u3 u4"),
      (3L, "s2", "tpl tpl u5 u6"),
      (4L, "s2", "u7 u8 u9 u0"))
      .toDF("doc_id", "source", "text")
    val got = Chunking.windowDupRate(docs, "doc_id", "source", "text",
        windowTokens = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: 4 windows, the two "tpl tpl" flag -> 500000 ppm
    // s2: 4 windows, one "tpl tpl" flags (its hash repeats corpus-wide)
    assert(got === Seq(
      ("s1", 4L, 2L, 500000L),
      ("s2", 4L, 1L, 250000L)))
  }
}
