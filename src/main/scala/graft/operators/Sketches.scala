package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02; the
  * bottom-k refinement in Beyer et al., SIGMOD'07): hash every value
  * onto a uniform 48-bit line, keep the k smallest per group, and
  * estimate the distinct count as `(k-1) · 2^48 / h_k` from the k-th
  * smallest hash. Unlike `approx_count_distinct`'s HLL++ register
  * blob, a KMV sketch is plain rows — mergeable by "union, re-take the
  * k smallest" (associative + commutative, so partition partials
  * combine in any order), auditable in SQL on any engine, and
  * deterministic: md5 is content-keyed, so the same data produces the
  * SAME sketch on any run, partitioning, or engine.
  *
  * Scale shape: values are distinct-ed (hash agg with map-side
  * partials), then the per-group bottom-k runs as a hash-partitioned
  * `row_number` window — Spark plans the `<= k` filter as
  * WindowGroupLimit, so every scan partition prunes to its local
  * bottom-k BEFORE the exchange and the shuffle carries ≤ k rows per
  * group per partition, never the corpus.
  */
object Sketches {

  /** 2^48 — the hash line length; any small-int multiple is an exact
    * double (mantissa = the multiplier), so estimates are
    * engine-deterministic.
    */
  val HashLine: Double = 281474976710656.0

  /** First 48 bits of md5 as a non-negative long position. */
  def hash48(v: Column): Column =
    conv(substring(md5(v), 1, 12), 16, 10).cast("long")

  /** The KMV sketch rows: the k smallest distinct-value hashes per
    * group — `(groupCols..., rk, h, v)`, rk 1-based ascending by
    * (hash, value). Keep the rows to merge sketches later; feed to
    * [[kmvEstimate]] for the cardinality estimate.
    */
  def kmvSketch(values: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val distinctVals = values
      .select(groupCols.map(col) :+ col(valueCol).as("v"): _*).distinct()
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("v"))
    distinctVals.withColumn("h", hash48(col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(groupCols.map(col) :+ col("rk").cast("long").as("rk") :+
        col("h") :+ col("v"): _*)
  }

  /** Distinct-count estimate per group from sketch rows: exact when the
    * sketch is not full (fewer than k distinct values exist), else
    * `(k-1) · 2^48 / h_k`. Returns
    * `(groupCols..., n_kept, kth_hash, est_distinct)`.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashLine) /
            col("kth_hash").cast("double")))

  /** Merge two sketches built with the same k (e.g. from different
    * corpus partitions or days): union the rows, re-take the bottom-k.
    * `kmvSketch(a ∪ b) == kmvMerge(kmvSketch(a), kmvSketch(b))` —
    * spec-pinned.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String],
               k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("v"))
    a.unionByName(b)
      .select(groupCols.map(col) :+ col("h") :+ col("v"): _*).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(groupCols.map(col) :+ col("rk").cast("long").as("rk") :+
        col("h") :+ col("v"): _*)
  }
}
