package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — classify every row of two table snapshots as
  * added / removed / changed by comparing an engine-invariant row hash
  * of the compared columns under the key.
  *
  * This is the other half of [[TableChecksum]]: the checksum says
  * WHETHER two copies diverge; the diff says WHERE. One full outer
  * join hashed on the key — both sides shuffle once on the same key
  * (or zero times if both snapshots are bucketed/partitioned by it),
  * and the hash comparison is row-local. At 100 TB this is the
  * standard incremental-load primitive: the "changed ∪ added" output
  * is exactly the delta to merge, "removed" the keys to retire.
  */
object SnapshotDiff {

  /** (key, change_type) for every key whose row differs between the
    * snapshots; unchanged keys are not emitted.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
           compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("k"),
      TableChecksum.rowHash(compareCols.map(col)).as("oh"))
    val n = newSnap.select(col(keyCol).as("k"),
      TableChecksum.rowHash(compareCols.map(col)).as("nh"))
    // null-safe key equality: an identical NULL-keyed row in both
    // snapshots is unchanged, not an added+removed pair
    o.as("o").join(n.as("n"), col("o.k") <=> col("n.k"), "full_outer")
      .withColumn("change_type",
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") =!= col("nh"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col("o.k"), col("n.k")).as(keyCol), col("change_type"))
  }
}
