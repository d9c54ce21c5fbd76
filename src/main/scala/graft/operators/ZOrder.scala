package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data layout
  * lever: writing a table `repartitionByRange(zcode)` +
  * `sortWithinPartitions(zcode)` clusters BOTH key dimensions into
  * every file, so parquet min/max stats prune scans filtered on either
  * key (or both) — the standard layout for two-key point/range lookup
  * at 100 TB, where a single-column sort only prunes its own column.
  *
  * The interleave is pure integer bit arithmetic (shift/mask spread,
  * codegen'd Column ops — no UDF), deterministic and engine-invariant.
  */
object ZOrder {

  /** Spread the low 21 bits of `c`: bit i moves to position 2i. */
  private def spread(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton code of the low 21 bits of each key. */
  def morton2(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Lay `df` out in Z-order on (aCol, bCol): range-partitioned and
    * sorted within partitions by the Morton code, ready to write.
    */
  def layout(df: DataFrame, aCol: String, bCol: String,
             numPartitions: Int): DataFrame = {
    val z = morton2(col(aCol), col(bCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
