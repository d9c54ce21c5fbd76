package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion-funnel analysis — "of the users who did A, how
  * many later did B, and later still C?" (the product-analytics
  * staple; same semantics as the sequential-funnel operators in the
  * event-analytics engines). The sequence constraint is strict event
  * ORDER, not mere co-occurrence: stage k counts a user only if a
  * stage-k event happened strictly AFTER that user's first qualifying
  * stage-(k−1) event.
  *
  * Scale shape: stage k is ONE user-key hash join (stage-k events ⋈
  * the shrinking reached-set) plus ONE hash aggregation (`min` — a
  * map-side-combining agg), composed lazily into a single job. No
  * windows, no per-user event arrays, no driver loop over data — the
  * per-stage frames only carry (user, first_ts), and the reached set
  * monotonically shrinks so AQE can flip late stages to broadcast
  * joins on its own. Events are filtered to one stage's type before
  * each join, so the type predicate reaches the parquet scan.
  */
object Funnel {

  /** `(u, ts, stage_idx)`: for every user and every funnel stage they
    * reached IN ORDER, the earliest qualifying event time. Stage 0 is
    * the user's first `stages(0)` event; stage k the first `stages(k)`
    * event strictly after their stage-(k−1) time. Timestamps must be
    * a numeric (epoch) column; ties inside one user are not ordered —
    * callers should ensure per-user timestamp uniqueness (driver data
    * has µs-unique events per user).
    */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).cast("long").as("ts"))
    var reached = ev.filter(col("t") === stages.head)
      .groupBy("u").agg(min("ts").as("ts"))
    var acc = reached.withColumn("stage_idx", lit(0))
    for (i <- 1 until stages.length) {
      val prev = reached.select(col("u"), col("ts").as("prev_ts"))
      reached = ev.filter(col("t") === stages(i))
        .join(prev, "u")
        .filter(col("ts") > col("prev_ts"))
        .groupBy("u").agg(min("ts").as("ts"))
      acc = acc.unionAll(reached.withColumn("stage_idx", lit(i)))
    }
    acc
  }

  /** Per-stage rollup: `(stage_idx, stage, n_users, conv_ppm)` where
    * `conv_ppm` is the exact-integer ppm conversion from the PREVIOUS
    * stage (stage 0 pinned at 1,000,000). The window runs on the
    * k-row post-aggregation frame — bounded by the stage count, never
    * by data.
    */
  def stageCounts(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = stages.zipWithIndex
      .map { case (s, i) => struct(lit(i).as("i"), lit(s).as("s")) }
    val names = explode(array(idx: _*)).as("st")
    val counts = stageTimes(events, userCol, typeCol, tsCol, stages)
      .groupBy(col("stage_idx")).agg(count(lit(1)).as("n_users"))
    // left join against the full stage list so empty stages show 0
    val all = events.sparkSession.range(1).select(names)
      .select(col("st.i").as("stage_idx"), col("st.s").as("stage"))
      .join(counts, Seq("stage_idx"), "left")
      .withColumn("n_users", coalesce(col("n_users"), lit(0L)))
    val w = Window.orderBy("stage_idx") // k rows total — bounded
    all.withColumn("__prev", lag("n_users", 1).over(w))
      .withColumn("conv_ppm",
        when(col("stage_idx") === 0, lit(1000000L))
          .when(col("__prev") === 0, lit(0L)) // funnel already empty
          .otherwise(expr("n_users * 1000000L DIV __prev")))
      .drop("__prev")
      .orderBy("stage_idx")
  }
}
