package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 build from a change-event stream:
  * per key, consecutive runs of the same attribute value collapse into
  * one version row with a `[valid_from, valid_to)` interval; the open
  * (current) version carries the supplied high timestamp — the
  * warehouse-standard dimension-history shape (cf. the reference's
  * insert/update lifecycle around `DbImportWorker`'s UPSERT modes,
  * which maintains only the current row; SCD2 is the history-keeping
  * generalization a lake pipeline needs).
  *
  * Scale shape: lag (change detection), lead (interval close) and the
  * version ordinal all run inside ONE key-partitioned window — a
  * single shuffle regardless of history depth. The tie column makes
  * the within-key order total, so version assignment is deterministic
  * on any engine and partitioning.
  */
object Scd2 {

  /** `(keyCol, version_no, attrCol, valid_from, valid_to)`, versions
    * 1-based in `(tsCol, tieCol)` order. `attrCol` must be non-null —
    * a null attribute cannot be change-compared with `=!=`.
    */
  def versions(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, attrCol: String, highTs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // the filtered frame re-evaluates the window over CHANGE rows only,
    // so row_number is the version ordinal and lead(ts) the next
    // version's start — no second shuffle (same partitioning key)
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changes
      .withColumn("version_no", row_number().over(w).cast("long"))
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w), lit(highTs)))
      .select(col(keyCol), col("version_no"), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Bitemporal point query: the state VALID at `validAt` AS KNOWN at
    * `knownAt`, over a table carrying both a `[validFrom, validTo)`
    * valid-time interval and a `txnCol` transaction (recording) time —
    * the two-axis "what did we believe on date T about date V"
    * question (Snodgrass, "Developing Time-Oriented Database
    * Applications in SQL"). Rows recorded after `knownAt` are
    * invisible; among the visible rows whose interval contains
    * `validAt`, the LATEST-recorded one per key wins (a correction
    * supersedes the original it restates).
    *
    * One filter + one hash aggregation (`max(struct)` arg-max keyed
    * by txn time — no window, no sort), so the 100 TB point query is
    * a single scan with map-side partials. Valid intervals must
    * partition time per key (the [[versions]] contract) and txn times
    * must be unique per (key, interval) — then the arg-max never
    * reaches its lower-order tie-break fields and the winner is
    * engine-deterministic.
    */
  def bitemporalAsOf(table: DataFrame, keyCol: String,
                     validFromCol: String, validToCol: String,
                     txnCol: String, payloadCols: Seq[String],
                     validAt: Column, knownAt: Column): DataFrame = {
    val carried = Seq(txnCol, validFromCol, validToCol) ++ payloadCols
    table.filter(col(validFromCol) <= validAt && validAt < col(validToCol) &&
        col(txnCol) <= knownAt)
      .groupBy(col(keyCol))
      .agg(max(struct(carried.map(col): _*)).as("__m"))
      .select(col(keyCol) +: carried.map(c => col(s"__m.$c").as(c)): _*)
  }
}
