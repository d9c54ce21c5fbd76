package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez, TCS 1985) — the
  * farthest-point traversal that picks `k` maximally-spread
  * representatives of an embedding corpus. The training-data read:
  * the selected rows are a diversity coreset (each center is the
  * point FARTHEST from everything already kept), and the returned
  * radius sequence is the classic 2-approximation certificate — after
  * `i` centers every point sits within `coverage` of one of them, and
  * no `i`-center solution can do better than `coverage / 2`.
  *
  * Spark shape, per round: the newest center's vector travels as a
  * LITERAL array (no join, no broadcast exchange — `k` and `dims` are
  * small constants), the running min-distance column updates with one
  * map-side `least`, and the next center is a top-1
  * `orderBy(...).limit(1)` (TakeOrdered: per-partition top-1 partials,
  * one row to the driver). The corpus is scanned `k` times over a
  * persisted (id, vec, dist) projection and never shuffles — the same
  * posture holds on 1000 executors at 100 TB.
  *
  * Deterministic and engine-reproducible by construction:
  *  - vectors are quantized ONCE to integer micro-units (the q99
  *    engine-proven `CAST(x AS DECIMAL(18,6))`, then an exact ×1e6
  *    shift) so every distance is an EXACT BIGINT — no FP
  *    accumulation order anywhere;
  *  - the seed is the lowest-id point, argmax ties break to the
  *    lowest id;
  *  - squared-distance sums over dims fit BIGINT for any |x| < ~3e5
  *    at 64 dims (micro-units keep per-dim diffs² ≤ ~4e22/dims);
  *    unit-norm-ish embeddings are orders of magnitude inside that.
  */
object Coreset {

  /** Exact integer squared distance between the micro-unit vector
    * column and a constant micro-unit vector.
    */
  private def distSq(v: Column, center: Seq[Long]): Column =
    aggregate(
      zip_with(v, typedlit(center), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Farthest-point selection: `k` rows
    * `(sel_order, <idCol>, sel_dist_sq, coverage_sq)` where
    * `sel_dist_sq` is the (exact, micro-unit²) min-distance of the
    * i-th center to the previous centers at the moment it was picked
    * (0 for the seed) and `coverage_sq` is the max over all points of
    * the min-distance to the first i centers — the Gonzalez radius
    * sequence, non-increasing in i.
    */
  def kCenter(points: DataFrame, idCol: String, vecCol: String,
              k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points
      .select(col(idCol).cast("long").as("__pid"),
        transform(col(vecCol).cast("array<double>"),
          x => (x.cast("decimal(18,6)") * 1000000).cast("long")).as("__v"))
      .persist()
    // the running (id, vec, min-dist) frame is reassigned per round;
    // declared here so the finally can release whichever incarnation
    // was live if a mid-loop action throws (persist-leak guard)
    var cur: DataFrame = null
    try {
      // deterministic seed: the lowest-id point (one row to the driver)
      val seedRows = pts.orderBy(col("__pid")).limit(1)
        .select(col("__pid"), col("__v")).as[(Long, Seq[Long])].collect()
      require(seedRows.nonEmpty, "kCenter needs a non-empty points frame")
      val seed = seedRows.head
      var selected = Vector((seed._1, 0L)) // (pid, sel_dist_sq)
      cur = pts.withColumn("__md", distSq(col("__v"), seed._2)).persist()
      var coverages = Vector.empty[Long]
      var i = 2
      var exhausted = false
      while (i <= k && !exhausted) {
        // the next center IS the coverage witness of the current set;
        // md = 0 means every remaining point duplicates a center —
        // further rounds would re-pick duplicates, so stop early
        val top = cur.filter(col("__md") > 0)
          .orderBy(col("__md").desc, col("__pid")).limit(1)
          .as[(Long, Seq[Long], Long)].collect()
        if (top.isEmpty) { exhausted = true }
        else {
          val (pid, vec, md) = top.head
          coverages :+= md
          selected :+= ((pid, md))
          val next = cur.withColumn("__md",
            least(col("__md"), distSq(col("__v"), vec))).persist()
          cur.unpersist()
          cur = next
          i += 1
        }
      }
      val Seq(finalCov) = cur.agg(coalesce(max(col("__md")), lit(0L)))
        .as[Long].collect().toSeq
      coverages :+= finalCov
      selected.zip(coverages).zipWithIndex.map {
        case (((pid, sd), cov), i) => (i + 1L, pid, sd, cov)
      }.toDF("sel_order", idCol, "sel_dist_sq", "coverage_sq")
    } finally {
      pts.unpersist()
      if (cur != null) cur.unpersist()
    }
  }
}
