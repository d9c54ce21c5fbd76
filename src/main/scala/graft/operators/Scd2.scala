package graft.operators

import org.apache.spark.sql.DataFrame
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
}
