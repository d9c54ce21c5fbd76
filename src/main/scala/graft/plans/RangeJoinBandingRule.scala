package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, DateType,
  DayTimeIntervalType, IntegerType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: band ad-hoc range joins.
  *
  * A join whose only cross-side predicate is a bounded time band —
  * `l.ts BETWEEN r.ts - X AND r.ts + Y` in any algebraic arrangement —
  * has no equi-key for Spark to hash on, so the planner falls back to
  * BroadcastNestedLoopJoin / CartesianProduct: O(|L|·|R|) comparisons,
  * a non-starter on a 100 TB join. [[graft.operators.TemporalJoins
  * .bandedRangeJoin]] avoids that by hand (quantize time into
  * band-width buckets, replicate each right row into the ≤ 2 buckets
  * it can match, equi-join on the band, keep the exact predicate as a
  * residual filter); this rule applies the SAME rewrite to ad-hoc
  * SQL/DataFrame joins automatically, so an analyst never plans the
  * quadratic shape without knowing it.
  *
  * Fires only when the join has NO cross-side equi-conjunct (with one,
  * Spark already plans a hash/sort-merge join on that key and each key
  * group is bounded; banding there would trade a working plan for
  * replication fan-out). The rewrite is exact: the band equality is a
  * necessary condition implied by the bounds (floor is monotone), the
  * original predicates all remain in the join condition, and each
  * (l, r) pair can meet on at most ONE band (the left row's band is a
  * single value), so no duplicates are introduced. Bands use true
  * FLOOR division (not `div` truncation) so negative timestamps band
  * correctly. NULL times on either side produce NULL bands, which the
  * inner equi-join drops — exactly the rows the original range
  * predicate rejects. Idempotent under the optimizer's fixed-point
  * loop via the `__graft_band` marker attributes. Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`).
  *
  * Time columns may be LongType epochs, TIMESTAMP, or DATE — the
  * types an analyst actually writes `l.ts BETWEEN r.ts - INTERVAL '5'
  * MINUTE AND r.ts + INTERVAL '5' MINUTE` over. TIMESTAMP columns band
  * on their epoch-micros ([[UnixMicros]] — the physical representation,
  * so the conversion is a no-op long read), DATE columns on epoch-days
  * ([[UnixDate]]); day-time INTERVAL literals fold to exact micros and
  * `date_add`/`date_sub` literals to exact days. Calendar-aware
  * arithmetic is deliberately NOT linearized: year-month intervals and
  * calendar intervals with month/day components vary in physical length
  * (month lengths, DST), so those predicates are left un-rewritten
  * rather than banded approximately. The two sides of a band must share
  * one time type — mixed-type comparisons (which need casts the
  * extractor does not traverse) never form a band.
  *
  * Domain precondition: the band arithmetic (`rt − hi`, pmod/div
  * alignment) runs in unchecked Long math, so epoch VALUES within
  * `hi`/`width` of ±2^63 could wrap under ANSI-off and mis-band a row
  * (the band equality is treated as a necessary condition, so a wrapped
  * row would be silently dropped). The rule therefore assumes
  * |epoch value| < 2^62 — comfortably true for every real epoch unit
  * (2026 ≈ 1.8e9 s / 1.8e15 µs / 1.8e18 ns, all < 4.6e18 = 2^62) and
  * for any TIMESTAMP this side of the year ~146,000; synthetic
  * near-Long.Max sentinel "timestamps" are out of contract.
  */
object RangeJoinBandingRule extends Rule[LogicalPlan] with PredicateHelper {

  /** One comparison conjunct normalized to a bound on (rt − lt). */
  private case class Band(lt: Attribute, rt: Attribute,
                          lower: Option[Long], upper: Option[Long])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(cond), _)
        if !cond.references.exists(_.name.startsWith("__graft_band")) &&
          cond.deterministic &&
          // stream-stream joins have their own state-store execution
          // and watermark bookkeeping — a Generate/band rewrite there
          // would detach the time columns the engine tracks; leave
          // streaming plans to intervalJoinStreams
          !l.isStreaming && !r.isStreaming =>
      rewrite(j).getOrElse(j)
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val lOut = j.left.outputSet
    val rOut = j.right.outputSet

    def sideOf(a: Attribute): Int =
      if (lOut.contains(a)) 0 else if (rOut.contains(a)) 1 else -1

    // an existing cross-side equi-conjunct means Spark already has a
    // hash key — leave the plan alone
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        val as = a.references.toSeq.map(sideOf).distinct
        val bs = b.references.toSeq.map(sideOf).distinct
        (as == Seq(0) && bs == Seq(1)) || (as == Seq(1) && bs == Seq(0))
      case EqualNullSafe(a, b) =>
        val as = a.references.toSeq.map(sideOf).distinct
        val bs = b.references.toSeq.map(sideOf).distinct
        (as == Seq(0) && bs == Seq(1)) || (as == Seq(1) && bs == Seq(0))
      case _ => false
    }
    if (hasEqui) return None

    // collect bounds on (rt − lt) per (lt, rt) attribute pair
    val bounds = scala.collection.mutable.Map
      .empty[(Attribute, Attribute), (Option[Long], Option[Long])]
    conjuncts.foreach { c =>
      band(c, sideOf).foreach { b =>
        val k = (b.lt, b.rt)
        val (lo, hi) = bounds.getOrElse(k, (None, None))
        bounds(k) = (maxOpt(lo, b.lower), minOpt(hi, b.upper))
      }
    }
    bounds.collectFirst {
      case ((lt, rt), (Some(lo), Some(hi))) if hi >= lo &&
          // width and the band arithmetic must stay inside Long
          BigInt(hi) - BigInt(lo) < (1L << 62) &&
          math.abs(lo) < (1L << 62) && math.abs(hi) < (1L << 62) =>
        val width = math.max(1L, hi - lo)
        // left: band of lt
        val lBandAlias =
          Alias(floorDiv(toEpochLong(lt), width), "__graft_band_l")()
        val newLeft = Project(j.left.output :+ lBandAlias, j.left)
        // right: one row per band the admissible left window overlaps —
        // lt ∈ [rt−hi, rt−lo] ⇒ band ∈ [⌊(rt−hi)/w⌋, ⌊(rt−lo)/w⌋],
        // at most 2 + (hi−lo)/w ≤ 3 replicas
        val rBandAttr =
          AttributeReference("__graft_band_r", LongType, nullable = true)()
        val gen = Generate(
          Explode(Sequence(
            floorDiv(Subtract(toEpochLong(rt), Literal(hi)), width),
            floorDiv(Subtract(toEpochLong(rt), Literal(lo)), width),
            None, Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(rBandAttr), child = j.right)
        val newCond = And(j.condition.get,
          EqualTo(lBandAlias.toAttribute, rBandAttr))
        val banded = Join(newLeft, gen, Inner, Some(newCond), j.hint)
        Project(j.output, banded)
    }
  }

  /** True floor division for positive literal width (trunc `div` of the
    * pmod-aligned numerator — exact for negatives too).
    */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val wl = Literal(w)
    IntegralDivide(Subtract(a, Pmod(a, wl)), wl)
  }

  /** Epoch-Long view of a time attribute for the band arithmetic:
    * Long passes through, TIMESTAMP reads its epoch-micros (a no-op
    * long read of the physical value), DATE its epoch-days. NULL in →
    * NULL band → dropped by the inner equi-join, matching the original
    * range predicate's NULL semantics.
    */
  private def toEpochLong(a: Attribute): Expression = a.dataType match {
    case TimestampType => UnixMicros(a)
    case DateType => Cast(UnixDate(a), LongType)
    case _ => a
  }

  /** Normalize one comparison to a bound on (rt − lt): move everything
    * to one side (`a ≤ b  ⇒  b − a ≥ 0`), extract the ±1-coefficient
    * linear form, and read the bound off whichever of (rt − lt) or
    * (lt − rt) survives. Strict inequalities tighten by 1 (integral
    * domain). Covers `l.ts BETWEEN r.ts−X AND r.ts+Y`,
    * `r.ts − l.ts ≤ k`, reversed operands, and any literal shuffling.
    */
  private def band(c: Expression,
                   sideOf: Attribute => Int): Option[Band] = {
    def mk(a: Expression, b: Expression, strict: Boolean): Option[Band] =
      for {
        (ma, ca) <- linform(a)
        (mb, cb) <- linform(b)
        // b − a ≥ (strict ? 1 : 0):  Σ coeff·attr + const ≥ s
        m <- mergeCoeffs(mb, ma, signRight = -1)
        constV = math.subtractExact(cb, ca)
        s = if (strict) 1L else 0L
        res <- m.toSeq.sortBy(_._1.exprId.id) match {
          // both attrs must share one time type: the constant is in the
          // type's unit (raw / micros / days), so a mixed pair (possible
          // only through casts the extractor doesn't traverse anyway)
          // would put one bound across two units
          case Seq((x, cx), (y, cy)) if cx == -cy &&
              x.dataType == y.dataType =>
            val (plus, minus) = if (cx == 1) (x, y) else (y, x)
            (sideOf(plus), sideOf(minus)) match {
              // rt − lt + const ≥ s  ⇒  lower bound s − const
              case (1, 0) => Some(Band(minus, plus,
                Some(math.subtractExact(s, constV)), None))
              // lt − rt + const ≥ s  ⇒  rt − lt ≤ const − s
              case (0, 1) => Some(Band(plus, minus, None,
                Some(math.subtractExact(constV, s))))
              case _ => None
            }
          case _ => None
        }
      } yield res
    try c match {
      case LessThanOrEqual(a, b) => mk(a, b, strict = false)
      case LessThan(a, b) => mk(a, b, strict = true)
      case GreaterThanOrEqual(a, b) => mk(b, a, strict = false)
      case GreaterThan(a, b) => mk(b, a, strict = true)
      case _ => None
    } catch { case _: ArithmeticException => None } // literal overflow
  }

  /** ±1-coefficient linear form of one expression: LongType / TIMESTAMP
    * / DATE attributes with sign, plus a folded integral constant in
    * the attribute type's unit (raw / epoch-micros / epoch-days).
    */
  private def linform(e: Expression)
      : Option[(Map[Attribute, Int], Long)] = e match {
    case a: Attribute if a.dataType == LongType ||
        a.dataType == TimestampType || a.dataType == DateType =>
      Some((Map(a -> 1), 0L))
    // ts ± INTERVAL: day-time intervals are exact micros; calendar
    // intervals only with zero month/day components (months vary in
    // length, days are DST-sensitive under a zoned session)
    case ta: TimestampAddInterval => for {
      (m, c) <- linform(ta.left)
      d <- intervalMicros(ta.right)
    } yield (m, math.addExact(c, d))
    case da: DateAdd => for {
      (m, c) <- linform(da.left); d <- foldedLong(da.right)
    } yield (m, math.addExact(c, d))
    case ds: DateSub => for {
      (m, c) <- linform(ds.left); d <- foldedLong(ds.right)
    } yield (m, math.subtractExact(c, d))
    case Add(l, r, _) => for {
      (ml, cl) <- linform(l); (mr, cr) <- linform(r)
      m <- mergeCoeffs(ml, mr, signRight = 1)
    } yield (m, math.addExact(cl, cr))
    case Subtract(l, r, _) => for {
      (ml, cl) <- linform(l); (mr, cr) <- linform(r)
      m <- mergeCoeffs(ml, mr, signRight = -1)
    } yield (m, math.subtractExact(cl, cr))
    case UnaryMinus(x, _) => linform(x).flatMap { case (m, c) =>
      val neg = m.map { case (a, s) => a -> -s }
      Some((neg, math.negateExact(c)))
    }
    case f if f.foldable => foldedLong(f).map(v => (Map.empty[Attribute, Int], v))
    case _ => None
  }

  /** Foldable integral expression evaluated to Long. */
  private def foldedLong(e: Expression): Option[Long] =
    if (e.foldable && (e.dataType == LongType || e.dataType == IntegerType))
      e.eval() match {
        case i: java.lang.Integer => Some(i.longValue())
        case l: java.lang.Long => Some(l.longValue())
        case _ => None
      }
    else None

  /** Foldable interval evaluated to exact micros — day-time intervals
    * always; calendar intervals only when their month/day components
    * are zero (those are calendar-relative, not fixed micros).
    */
  private def intervalMicros(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.dataType match {
      case _: DayTimeIntervalType => e.eval() match {
        case l: java.lang.Long => Some(l.longValue())
        case _ => None
      }
      case CalendarIntervalType => e.eval() match {
        case ci: CalendarInterval if ci.months == 0 && ci.days == 0 =>
          Some(ci.microseconds)
        case _ => None
      }
      case _ => None
    }

  /** Sum coefficient maps (right side multiplied by ±1); reject any
    * attribute whose combined coefficient leaves {−1, 0, 1} (a 2·ts
    * term is not a band), dropping exact cancellations.
    */
  private def mergeCoeffs(l: Map[Attribute, Int], r: Map[Attribute, Int],
                          signRight: Int): Option[Map[Attribute, Int]] = {
    val combined = (l.keySet ++ r.keySet).map { a =>
      a -> (l.getOrElse(a, 0) + signRight * r.getOrElse(a, 0))
    }.toMap
    if (combined.valuesIterator.exists(c => c < -1 || c > 1)) None
    else Some(combined.filter(_._2 != 0))
  }

  private def maxOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a.toSeq ++ b.toSeq).reduceOption(_ max _)
  private def minOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a.toSeq ++ b.toSeq).reduceOption(_ min _)
}
