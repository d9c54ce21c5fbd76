package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Merge, Ordinals}
import graft.operators.Merge.{DuplicateMode, ImportMode, Key}

/** Temporal join queries — the as-of family (backward/forward/nearest, native exec dispatch) and banded range joins.
  *
  * Split from the monolithic `SparkEntry.scala` in round 11 (it had
  * grown to 9.5k lines); self-typed to [[SparkEntry]] so every query
  * and shared helper keeps resolving unqualified across family files.
  * Contributes [[queriesTemporal]] / [[oracleSqlTemporal]] to the
  * assembled driver contract.
  */
private[graft] trait TemporalQueries { this: SparkEntry.type =>

  import Tables._

  // ---------------------------------------------------------------- q44
  /** As-of (point-in-time) join: every click event gains the same
    * user's most recent view value at-or-before it. The right side is
    * pre-aggregated to one row per (user, ts) — the as-of uniqueness
    * contract. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def q44AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoin(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q45
  /** Banded range join: for every click, count the same user's views
    * within ±5 minutes. The band equi-join bounds fan-out; the oracle is
    * the plain range join (banding must be result-invisible).
    */
  def q45RangeJoin(s: SparkSession, d: String): DataFrame = {
    val fiveMinNs = 300000000000L // ts is nanos since epoch
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    operators.TemporalJoins.bandedRangeJoin(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "view_ts", lower = -fiveMinNs, upper = fiveMinNs)
      .groupBy(col("user_id"), col("event_id"))
      .agg(count(lit(1)).as("n_views_nearby"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q204
  /** The NATIVE as-of join ([[graft.plans.AsofJoinExec]] — custom
    * logical node + planner strategy + sort-merge physical operator)
    * on q44's exact query, against the same DuckDB `ASOF LEFT JOIN`
    * oracle: the whole-operator Catalyst extension path verified
    * end-to-end. One merge pass over co-clustered (key, time)-sorted
    * children — no union, no window, no second materialization of the
    * probe side.
    */
  def q204AsofNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    graft.plans.AsofJoinNative.asof(clicks, views,
        Seq("user_id"), Seq("v_user"), "ts", "v_ts")
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q219
  /** FORWARD as-of join ([[operators.TemporalJoins.asofJoinForward]]):
    * every click gains the same user's EARLIEST view value at-or-after
    * it — the "next event" lookup, time-negated onto the native
    * backward sort-merge exec. Oracle: DuckDB's native forward ASOF
    * (`c.ts <= v.ts`).
    */
  def q219AsofForward(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoinForward(clicks,
        views.withColumnRenamed("v_user", "user_id"), Seq("user_id"),
        leftTs = "ts", rightTs = "v_ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q221
  /** NEAREST as-of join ([[operators.TemporalJoins.asofJoinNearest]]):
    * every click gains the temporally CLOSEST same-user view value in
    * either direction (ties backward) — two native as-of passes in
    * one pipeline, no self-join. Oracle: both DuckDB ASOF directions
    * + the same closest-pick CASE.
    */
  def q221AsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoinNearest(clicks,
        views.withColumnRenamed("v_user", "user_id"), Seq("user_id"),
        leftTs = "ts", rightTs = "v_ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q225
  /** KEYLESS TIMESTAMP band join through [[graft.plans
    * .RangeJoinBandingRule]] — the round-11 headline oracle-gated end
    * to end: the raw analyst predicate `v_ts BETWEEN c_ts − INTERVAL
    * '10' MINUTE AND c_ts + INTERVAL '10' MINUTE` (TIMESTAMP columns,
    * INTERVAL literal, NO key) would plan BroadcastNestedLoopJoin; the
    * rule — registered here exactly as the `spark.sql.extensions`
    * deployment would — rewrites it to the banded equi-join over
    * epoch-micros, and the per-hour pair counts must equal DuckDB's
    * plain quadratic evaluation of the same predicate. Users < 300
    * bound the pair cardinality.
    */
  def q225TsBandJoin(s: SparkSession, d: String): DataFrame = {
    if (!s.experimental.extraOptimizations
        .contains(graft.plans.RangeJoinBandingRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.RangeJoinBandingRule
    val ev = events(s, d).filter(col("user_id") < 300)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts_utc").as("c_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("ts_utc").as("v_ts"))
    clicks.join(views,
        col("v_ts") >= col("c_ts") - expr("INTERVAL '10' MINUTE") &&
          col("v_ts") <= col("c_ts") + expr("INTERVAL '10' MINUTE"))
      .groupBy(date_trunc("hour", col("c_ts")).as("hour"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hour"))
  }

  // ---------------------------------------------------------------- q226
  /** TIMESTAMP-typed as-of join through the [[operators.TemporalJoins
    * .asofJoin]] dispatcher — q44's query with the time columns cast to
    * the analyst-default TIMESTAMP type, which round 11 taught the
    * dispatcher to normalize to epoch-micros and run on the native
    * [[graft.plans.AsofJoinExec]] (pre-r11 this silently fell back to
    * the windowed plan). Same DuckDB `ASOF LEFT JOIN` oracle as q44.
    */
  def q226AsofTimestamp(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_utc"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_utc").as("v_ts"))
      .agg(max(col("value")).as("view_value"))
    operators.TemporalJoins.asofJoin(clicks, views, Seq("user_id"),
        leftTs = "ts_utc", rightTs = "v_ts", rightVals = Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("view_value"), 6).as("view_value"))
      .orderBy(col("event_id"))
  }

  private[graft] def queriesTemporal: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_asof_join" -> (q44AsofJoin _),
    "q45_range_join" -> (q45RangeJoin _),
    "q204_asof_native" -> (q204AsofNative _),
    "q219_asof_forward" -> (q219AsofForward _),
    "q221_asof_nearest" -> (q221AsofNearest _),
    "q225_ts_band_join" -> (q225TsBandJoin _),
    "q226_asof_timestamp" -> (q226AsofTimestamp _))

  private[graft] def oracleSqlTemporal: Map[String, String] = Map(
    "q44_asof_join" ->
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "q45_range_join" ->
      """WITH clicks AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts AS view_ts FROM events
        |  WHERE event_type = 'view')
        |SELECT c.user_id, c.event_id, count(*) AS n_views_nearby
        |FROM clicks c JOIN views v ON c.user_id = v.user_id
        | AND v.view_ts BETWEEN c.ts - INTERVAL 5 MINUTE AND c.ts + INTERVAL 5 MINUTE
        |GROUP BY c.user_id, c.event_id ORDER BY c.event_id""".stripMargin,
    "q204_asof_native" ->
      // same oracle as q44: DuckDB's native ASOF LEFT JOIN — here it
      // verifies the custom AsofJoinExec physical operator
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "q219_asof_forward" ->
      // DuckDB native FORWARD ASOF: earliest view at-or-after the click
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts <= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "q221_asof_nearest" ->
      // both ASOF directions + the closest-pick CASE (ties backward);
      // interval comparison == the Spark side's ns-long comparison
      // because ts is microsecond-aligned on both engines
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts),
        |b AS (SELECT c.user_id, c.event_id, c.ts, c.value,
        |   v.view_value AS bv, v.ts AS bt
        | FROM clicks c ASOF LEFT JOIN views v
        |   ON c.user_id = v.user_id AND c.ts >= v.ts),
        |f AS (SELECT c.event_id, v.view_value AS fv, v.ts AS ft
        | FROM clicks c ASOF LEFT JOIN views v
        |   ON c.user_id = v.user_id AND c.ts <= v.ts)
        |SELECT b.user_id, b.event_id, b.value,
        | round(CASE WHEN f.fv IS NULL THEN b.bv
        |       WHEN b.bv IS NULL THEN f.fv
        |       WHEN (b.ts - b.bt) <= (f.ft - b.ts) THEN b.bv
        |       ELSE f.fv END, 6) AS view_value
        |FROM b JOIN f ON f.event_id = b.event_id
        |ORDER BY b.event_id""".stripMargin,
    "q225_ts_band_join" ->
      // the RAW quadratic predicate — DuckDB plans it however it likes
      // (IEJoin); Spark's banded rewrite must be result-invisible
      """WITH ev AS (SELECT event_type, ts FROM events WHERE user_id < 300),
        |clicks AS (SELECT ts AS c_ts FROM ev WHERE event_type = 'click'),
        |views AS (SELECT ts AS v_ts FROM ev WHERE event_type = 'view')
        |SELECT date_trunc('hour', c_ts) AS hour, count(*) AS n_pairs
        |FROM clicks JOIN views
        |  ON v_ts BETWEEN c_ts - INTERVAL 10 MINUTE
        |             AND c_ts + INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q226_asof_timestamp" ->
      // q44's oracle verbatim: DuckDB already reads ts as a µs
      // TIMESTAMP, so the TIMESTAMP-typed Spark dispatch must agree
      // with the same native ASOF LEFT JOIN
      """WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.value,
        | round(v.view_value, 6) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin)
}
