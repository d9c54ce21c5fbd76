package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/rebalancing operators.
  *
  * Both are pure scan-or-window work — no driver state, no RNG:
  * sampling decisions derive from an md5 hash of the row's own id, so
  * they are engine-invariant (any SQL engine reproduces the exact
  * sample), stable under re-ingestion and retries, and embarrassingly
  * parallel. That determinism is what makes a 100 TB sample auditable:
  * re-running the pipeline keeps/drops the same rows.
  */
object Sampling {

  /** Engine-invariant permille bucket of an id: first 8 hex digits of
    * md5 as an integer, mod 1000 (the q58 train/val/test hash family).
    */
  def hashPermille(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 1000

  /** Stratified sampling with per-stratum keep rates (permille): row
    * kept iff hash(id) falls under its stratum's rate — how a corpus
    * mix is rebalanced (e.g. downsample the dominant language) without
    * a shuffle: the filter is scan-stage and pushes down.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           ratesPermille: Map[String, Int],
                           defaultPermille: Int): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashPermille(col(idCol)) < rate)
  }

  /** Cap each group at `maxPerGroup` rows under a deterministic order —
    * the over-representation guard (e.g. at most N documents per source
    * domain). A per-GROUP window, hash-partitioned on the group keys:
    * parallelism is the number of groups, never one partition. The rank
    * is exposed as `quota_rank`.
    */
  def groupQuotaCap(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                    maxPerGroup: Int): DataFrame =
    df.withColumn("quota_rank",
        row_number().over(Window.partitionBy(groupCols.map(col): _*)
          .orderBy(order: _*)).cast("long"))
      .filter(col("quota_rank") <= maxPerGroup)
}
