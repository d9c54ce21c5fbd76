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
}
