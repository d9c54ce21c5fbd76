package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the rows no other row dominates
  * under (maximize `maxCol`, minimize `minCol`): the
  * best-quality-per-cost selection question (Börzsönyi et al.,
  * ICDE'01 "The Skyline operator"). Domination is the standard
  * strict-somewhere form: q dominates p iff q is ≥/≤ on both
  * dimensions and strictly better on at least one — exact duplicates
  * do not dominate each other, so tied frontier points all survive.
  *
  * Scale shape: the naive skyline is the quadratic NOT-EXISTS
  * self-join (the oracle replays exactly that); in 2-D it collapses
  * to "keep the min-`minCol` per `maxCol` level, then a prefix-min
  * sweep down the levels". Level reduction is one hash aggregation
  * over the data; the sweep's single-partition window runs on the
  * DISTINCT-`maxCol` frame (bounded by the value domain, never by
  * rows — the histQuantiles bin-frame discipline), and survivors
  * come back as a semi join. Rows with NULL in either dimension are
  * excluded (SQL comparison semantics: NULL neither dominates nor
  * survives).
  */
object Skyline {

  /** The input rows on the (max `maxCol`, min `minCol`) frontier. */
  def pareto2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val pts = df.filter(col(maxCol).isNotNull && col(minCol).isNotNull)
    // one representative per level: the per-maxCol minimum of minCol
    // (everything else in the level is dominated within the level)
    val levels = pts.groupBy(col(maxCol).as("__q"))
      .agg(min(col(minCol)).as("__mt"))
    // prefix min over strictly better levels: a level survives iff its
    // best minCol beats every higher level's best (ties lose to the
    // higher level — it dominates via the strict maxCol dimension)
    val w = Window.orderBy(col("__q").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = levels.withColumn("__m1", min(col("__mt")).over(w))
      .filter(col("__m1").isNull || col("__mt") < col("__m1"))
    pts.join(frontier,
      pts(maxCol) === frontier("__q") && pts(minCol) === frontier("__mt"),
      "left_semi")
  }
}
