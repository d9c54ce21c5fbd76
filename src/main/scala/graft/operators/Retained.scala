package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of persisted intermediate frames whose
  * lifetime outlives the operator call that created them.
  *
  * Several operators persist a frame that feeds two-or-more LAZY
  * branches of their result plan (`CorpusOverlap` vocab, `NgramLm`
  * bigram counts, `KnnGraph.knnEdgesLsh` keyed corpus,
  * `InvertedIndex` staged postings): the operator cannot unpersist
  * before returning — the caller has not run its action yet, and an
  * early unpersist would silently recompute the frame once per branch,
  * defeating the persist. Previously the contract was "callers run
  * `spark.catalog.clearCache()`", which Bench honored but API/CLI
  * sessions did not, so a long-lived session accumulated cached
  * frames.
  *
  * This registry closes that contract: every such persist is
  * registered here at creation, and [[releaseAll]] unpersists exactly
  * the graft-owned frames of ONE session — without clobbering caches
  * the embedding application owns (`clearCache` nukes those too).
  * Entry points pair each consuming action with a release:
  * `Verify` after every query's parquet dump, `Bench` after every
  * timed query, and specs via `RetainedSpec`. Library callers do the
  * same: consume the returned frame, then `Retained.releaseAll(spark)`.
  *
  * Keys use `applicationId:startTime` (stable and never reused for the
  * session's life) — same discipline as the parquet artifact registry.
  * Tracking holds only weak-reference-like bookkeeping (the frame
  * handle); releasing is `unpersist(blocking = false)` so it never
  * stalls a running action.
  */
object Retained {

  private val reg =
    scala.collection.concurrent.TrieMap.empty[String, List[DataFrame]]

  private def sessionKey(s: SparkSession): String =
    s"${s.sparkContext.applicationId}:${s.sparkContext.startTime}"

  /** Register an already-persisted frame for later [[releaseAll]];
    * returns it unchanged so call sites stay expression-shaped.
    */
  def track(df: DataFrame): DataFrame = {
    val k = sessionKey(df.sparkSession)
    reg.synchronized { reg.update(k, df :: reg.getOrElse(k, Nil)) }
    df
  }

  /** Unpersist every frame this session's graft operators retained;
    * returns how many were released. Safe to call at any point — a
    * released frame is recomputed, never wrong — and idempotent.
    */
  def releaseAll(spark: SparkSession): Int = {
    val frames = reg.remove(sessionKey(spark)).getOrElse(Nil)
    frames.foreach(f => scala.util.Try(f.unpersist(blocking = false)))
    frames.size
  }

  /** Frames currently tracked for this session (spec hook). */
  def trackedCount(spark: SparkSession): Int =
    reg.get(sessionKey(spark)).map(_.size).getOrElse(0)
}
