package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-invariant table checksums — verify that two copies of a table
  * (source vs imported target, two cluster runs, pre/post migration)
  * hold the same rows WITHOUT sorting or co-locating either side.
  *
  * Each row hashes to a 48-bit integer derived from the md5 of its
  * canonical '|'-joined string; the table digest is a pair of
  * commutative aggregates over those hashes (XOR + modular sum), so it
  * is partition-parallel, mergeable across any partitioning, and
  * independent of row order — the only checksum shape that works when
  * the two tables live on different clusters with different
  * partitionings. A mismatch localizes by re-running grouped on a key
  * prefix (the `groupCols` face).
  *
  * XOR alone is blind to duplicate pairs (x ⊕ x = 0); the modular sum
  * alone is blind to certain swaps; together they are a robust cheap
  * fingerprint. Both derive from md5, so any engine reproduces them.
  */
object TableChecksum {

  /** 48-bit engine-invariant row hash: first 12 hex digits of the md5
    * of the '|'-joined canonical row string. Each column canonicalizes
    * as `<charlen>:<value>` with NULL → `N` — a bare concat_ws would
    * SKIP nulls (rows differing only in which column is null collide)
    * and a value containing '|' could imitate a column boundary.
    */
  def rowHash(cols: Seq[Column]): Column = {
    val canon = cols.map { c =>
      val v = c.cast("string")
      coalesce(concat(length(v).cast("string"), lit(":"), v), lit("N"))
    }
    conv(substring(md5(concat_ws("|", canon: _*)), 1, 12), 16, 10).cast("long")
  }

  private val Mod = 1000000007L

  /** Per-group (or whole-table when `groupCols` is empty) checksum:
    * n_rows, xor_checksum, sum_checksum (modular).
    */
  def checksum(df: DataFrame, hashCols: Seq[String],
               groupCols: Seq[String] = Nil): DataFrame = {
    val h = rowHash(hashCols.map(col))
    val withH = df.withColumn("__h", h)
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      expr("bit_xor(__h)").as("xor_checksum"),
      (sum(col("__h").cast(DecimalType(38, 0))) % Mod).cast("long").as("sum_checksum"))
    if (groupCols.isEmpty) withH.agg(aggs.head, aggs.tail: _*)
    else withH.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
