package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, expressed as
  * scale-safe declarative plans (SURVEY §2.4 extension; the canonical
  * operators of time-series/feature-store pipelines):
  *
  *  - [[asofJoin]]: for every left row, the single most recent right row
  *    with `rightTs <= leftTs` per key — the point-in-time join. Not
  *    expressible as an equi-join; a raw range join degenerates to
  *    nested-loop. Formulated as union → per-key window
  *    `last(_, ignoreNulls)` running over event order: one shuffle on
  *    the key, per-key sort, NO global sort, no row explosion —
  *    wall-clock scales like a groupBy of left+right.
  *
  *  - [[bandedRangeJoin]]: pairs with `rightTs ∈ [leftTs+lower,
  *    leftTs+upper]` per key. The naive range predicate forces a
  *    broadcast-nested-loop in Spark; banding quantizes time into
  *    `upper−lower`-wide buckets, replicates each right row into the (≤
  *    2 + span) buckets it can match, and equi-joins on (key, band) with
  *    the exact range as a residual filter — the join fan-out is bounded
  *    by band population, never |L|×|R|.
  */
object TemporalJoins {

  /** Point-in-time join: left gains `rightVals` from the latest right
    * row at-or-before its timestamp (ties: the right row at the same
    * timestamp wins, matching `l.ts >= r.ts` semantics). `right` must be
    * unique per (keys, rightTs) — pre-aggregate if not, or the carried
    * values are nondeterministic (same contract as any as-of join).
    *
    * Default dispatch: LongType (epoch) timestamps take the NATIVE
    * sort-merge exec ([[graft.plans.AsofJoinExec]] — one merge pass
    * over co-clustered sorted children, half the shuffled volume of the
    * windowed plan and measurably faster at sf0.1); TIMESTAMP and DATE
    * columns normalize to their epoch longs (`unix_micros` /
    * `unix_date` — no-op reads of the physical value) and take the SAME
    * native exec, so the analyst-default types are not second-class;
    * any other timestamp type falls back to [[asofJoinWindowed]]. All
    * faces are result-identical (AsofJoinSpec property pin).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    epochNormalized(left, right, leftTs, rightTs) match {
      case Some((l2, r2, lc, rc)) =>
        return asofJoin(l2, r2, keys, lc, rc, rightVals).drop(lc)
      case None =>
    }
    if (left.schema(leftTs).dataType == LongType &&
        right.schema(rightTs).dataType == LongType) {
      // rename the right side into a reserved namespace so the native
      // node's no-collision contract holds for any input names
      val rKeys = keys.map(k => s"__asof_r_$k")
      val r2 = right.select(
        keys.map(k => col(k).as(s"__asof_r_$k")) ++
          (col(rightTs).as("__asof_r_ts") +:
            rightVals.map(v => col(v).as(s"__asof_r_$v"))): _*)
      graft.plans.AsofJoinNative
        .asof(left, r2, keys, rKeys, leftTs, "__asof_r_ts")
        .select(left.columns.toSeq.map(col) ++
          rightVals.map(v => col(s"__asof_r_$v").as(v)): _*)
    } else asofJoinWindowed(left, right, keys, leftTs, rightTs, rightVals)
  }

  /** FORWARD as-of join: the EARLIEST right row at-or-after each left
    * timestamp per key (ties: a same-instant right row matches) — the
    * "next event" lookup (next maintenance after a failure, next
    * quote after an order). Implemented by time negation over the
    * backward [[asofJoin]]: t ↦ −t reverses the order, so the latest
    * at-or-before in negated time IS the earliest at-or-after in real
    * time — LongType inputs therefore ride the native sort-merge exec
    * unchanged. Negation is exact for |t| < 2^63 (epoch domain).
    * TIMESTAMP/DATE columns normalize to epoch longs first.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    epochNormalized(left, right, leftTs, rightTs) match {
      case Some((l2, r2, lc, rc)) =>
        return asofJoinForward(l2, r2, keys, lc, rc, rightVals).drop(lc)
      case None =>
    }
    require(left.schema(leftTs).dataType == LongType &&
      right.schema(rightTs).dataType == LongType,
      "asofJoinForward needs LongType (epoch), TIMESTAMP or DATE timestamps")
    val l = left.withColumn("__asof_neg", -col(leftTs))
    val r = right.withColumn("__asof_negr", -col(rightTs))
      .drop(rightTs)
    asofJoin(l, r, keys, "__asof_neg", "__asof_negr", rightVals)
      .drop("__asof_neg")
  }

  /** NEAREST as-of join: the temporally CLOSEST right row per key in
    * either direction, ties to the at-or-before match — the sensor-
    * alignment join (match each reading to the nearest calibration,
    * whichever side it falls on). Composed as one pipeline: the
    * backward pass decorates the left frame, the forward pass runs
    * OVER the decorated frame (no self-join, no row-identity
    * requirement on the left), then one scan picks the closer match
    * per row. Cost: exactly two native as-of passes.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    epochNormalized(left, right, leftTs, rightTs) match {
      case Some((l2, r2, lc, rc)) =>
        return asofJoinNearest(l2, r2, keys, lc, rc, rightVals).drop(lc)
      case None =>
    }
    require(left.schema(leftTs).dataType == LongType &&
      right.schema(rightTs).dataType == LongType,
      "asofJoinNearest needs LongType (epoch), TIMESTAMP or DATE timestamps")
    require(!rightVals.contains(rightTs),
      "rightVals must not repeat the time column (it is carried anyway)")
    val vals = rightVals :+ rightTs
    def pfx(p: String, v: String) = s"__near_${p}_$v"
    // each direction carries ONE struct of (vals + matched ts) through
    // the join, so the picker below can compare distances field-wise
    def renamed(p: String) =
      right.select((keys.map(col) :+ col(rightTs).as(pfx(p, "ts")) :+
        struct(vals.map(col): _*).as(pfx(p, "v"))): _*)
    val b = asofJoin(left, renamed("b"), keys, leftTs, pfx("b", "ts"),
      Seq(pfx("b", "v")))
    val bf = asofJoinForward(b, renamed("f"), keys, leftTs, pfx("f", "ts"),
      Seq(pfx("f", "v")))
    val bt = col(pfx("b", "v")).getField(rightTs)
    val ft = col(pfx("f", "v")).getField(rightTs)
    val pickB = col(pfx("f", "v")).isNull ||
      (col(pfx("b", "v")).isNotNull &&
        (col(leftTs) - bt) <= (ft - col(leftTs))) // ties: backward
    val chosen = when(pickB, col(pfx("b", "v"))).otherwise(col(pfx("f", "v")))
    bf.select(left.columns.toSeq.map(col) ++
      rightVals.map(v => chosen.getField(v).as(v)): _*)
  }

  /** TIMESTAMP/DATE time columns → epoch-Long helper columns so every
    * as-of face rides the native LongType exec: `Some((left', right',
    * leftCol, rightCol))` when both sides are TIMESTAMP or both DATE
    * (`unix_micros` / `unix_date` — no-op reads of the physical value,
    * order-preserving, NULL-preserving), `None` for everything else
    * (LongType passes through; exotic types take the windowed face).
    * Callers drop the left helper column after the recursive join; the
    * right helper never reaches the output (only `rightVals` do).
    */
  private def epochNormalized(left: DataFrame, right: DataFrame,
                              leftTs: String, rightTs: String)
      : Option[(DataFrame, DataFrame, String, String)] = {
    import org.apache.spark.sql.types.{DataType, DateType, TimestampType}
    def toEpoch(c: Column, dt: DataType): Column = dt match {
      case TimestampType => unix_micros(c)
      case DateType => unix_date(c).cast("long")
      case _ => c
    }
    (left.schema(leftTs).dataType, right.schema(rightTs).dataType) match {
      case (lt @ (TimestampType | DateType), rt) if lt == rt =>
        Some((left.withColumn("__asof_lus", toEpoch(col(leftTs), lt)),
          right.withColumn("__asof_rus", toEpoch(col(rightTs), rt)),
          "__asof_lus", "__asof_rus"))
      case _ => None
    }
  }

  /** The declarative formulation of [[asofJoin]] — union both sides,
    * per-key `last(ignoreNulls)` running window, filter the right rows
    * back out. Works for ANY orderable timestamp type; kept as the
    * non-Long fallback and as the independent cross-check face the
    * specs compare the native exec against.
    */
  def asofJoinWindowed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // one struct column carries all right-side values through the window
    val r = right.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+
        struct(rightVals.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row — `>=` semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = u.withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    joined.select(leftCols.map(col) ++
      rightVals.map(v => col("__last_rv").getField(v).as(v)): _*)
  }

  /** Banded range join: inner-join pairs where
    * `rightTs - leftTs ∈ [lower, upper]` on the same `keys`. Band width
    * is `upper - lower` (minimum 1): each right row lands in every band
    * its admissible left window overlaps, then the exact predicate
    * filters residuals. Time and bounds share one unit (here: whatever
    * the ts columns use).
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      lower: Long, upper: Long): DataFrame = {
    require(upper >= lower, "upper bound must be >= lower bound")
    val width = math.max(1L, upper - lower)
    // integer `div`, NOT `/`: nanosecond timestamps (~1e18) exceed
    // double precision, and `/` on longs goes through double. Truncating
    // division == floor for the non-negative band operands used here.
    val l = left.withColumn("__band", expr(s"`$leftTs` div ${width}L"))
    // right row r matches left ts in [r-upper, r-lower] → bands
    // floor((r-upper)/w) .. floor((r-lower)/w)
    val r = right
      .withColumn("__band_lo", expr(s"(`$rightTs` - ${upper}L) div ${width}L"))
      .withColumn("__band_hi", expr(s"(`$rightTs` - ${lower}L) div ${width}L"))
      .withColumn("__band", explode(sequence(col("__band_lo"), col("__band_hi"))))
      .drop("__band_lo", "__band_hi")
    l.join(r, keys :+ "__band")
      .filter(col(rightTs) - col(leftTs) >= lower &&
        col(rightTs) - col(leftTs) <= upper)
      .drop("__band")
  }

  /** Interval × interval overlap join: every (left, right) pair on the
    * same key whose half-open intervals `[lStart, lEnd)` and
    * `[rStart, rEnd)` intersect — the temporal-allocation primitive
    * (sessions × campaigns, downtimes × jobs) that a naive theta-join
    * plans as a nested loop. Scale path is interval BANDING (the
    * standard genomics/temporal-DB decomposition): each interval
    * explodes to the width-`bandWidth` bands it covers, the pair
    * meets as a keys+band EQUI-join (hash-partitionable, AQE-skew
    * splittable), and the overlap predicate filters exactly. A pair
    * overlapping k shared bands would surface k times, so emission is
    * pinned to the single band containing `max(lStart, rStart)` — a
    * band both sides provably cover (it is < min(lEnd, rEnd)) — which
    * dedupes WITHOUT a distinct: no second shuffle, output arrives
    * exactly-once. Fan-out per row is `len/bandWidth + 1` band copies;
    * pick `bandWidth` near the typical interval length so both stay
    * O(1). Long-epoch units; empty intervals (`end <= start`) never
    * match. Column names must be disjoint across sides apart from
    * `keys` (same contract as the other joins here).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bandWidth: Long): DataFrame = {
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    def banded(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__b_lo", expr(s"`$s` div ${bandWidth}L"))
      .withColumn("__b_hi", expr(s"(`$e` - 1L) div ${bandWidth}L"))
      .withColumn("__band", explode(sequence(col("__b_lo"), col("__b_hi"))))
      .drop("__b_lo", "__b_hi")
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), keys :+ "__band")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        expr(s"greatest(`$lStart`, `$rStart`) div ${bandWidth}L") === col("__band"))
      .drop("__band")
  }

  /** Allen's interval-algebra relation (Allen, CACM'83) of half-open
    * `[lS, lE)` vs `[rS, rE)` as a label column — the full 13-relation
    * vocabulary (before/after, meets/met_by, overlaps/overlapped_by,
    * starts/started_by, during/contains, finishes/finished_by,
    * equals). On half-open integer intervals "meets" is exact end =
    * start adjacency. PRECONDITION: both intervals non-empty
    * (start < end) — Allen's algebra is undefined on empty intervals
    * and this expression would label them arbitrarily (e.g. [5,5) vs
    * [5,10) hits the "meets" branch). [[intervalOverlapJoin]] already
    * filters empties; standalone callers must too. Pure column
    * expression (codegen-friendly, composes with the overlap join —
    * whose output can only carry the nine intersecting relations).
    */
  def allenRelation(lS: Column, lE: Column, rS: Column, rE: Column): Column =
    when(lS === rS && lE === rE, "equals")
      .when(lE === rS, "meets")
      .when(rE === lS, "met_by")
      .when(lE < rS, "before")
      .when(rE < lS, "after")
      .when(lS === rS && lE < rE, "starts")
      .when(lS === rS, "started_by")
      .when(lE === rE && lS > rS, "finishes")
      .when(lE === rE, "finished_by")
      .when(lS > rS && lE < rE, "during")
      .when(lS < rS && lE > rE, "contains")
      .when(lS < rS, "overlaps")
      .otherwise("overlapped_by")
}
