package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native point-in-time (as-of) join — the whole-operator Catalyst
  * extension path (logical node → planner strategy → physical exec)
  * for the ONE temporal operator Spark's built-ins cannot express
  * without inflating the plan: the declarative formulation
  * ([[graft.operators.TemporalJoins.asofJoin]]) must union both
  * sides, run a per-key `last(ignoreNulls)` window over the combined
  * frame, and filter the right rows back out — two extra
  * materializations of the probe side. This exec instead asks
  * Catalyst for co-clustered, (key, time)-sorted children (the SAME
  * shuffle/sort the window pays once) and then streams BOTH sides in
  * one merge pass: for each left row, the held right row is the
  * latest with `rightTime <= leftTime` in its key group.
  *
  * Ties match the declarative face: a right row at the exact left
  * timestamp IS visible (`>=` semantics). Right must be unique per
  * (key, time) for deterministic carried values — the standard as-of
  * contract. Time columns must be LongType (epoch ns/µs — the house
  * timestamp discipline).
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-cluster both sides on the join keys: EnsureRequirements inserts
  // compatible hash shuffles exactly as it would for a shuffled join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // and sort each partition by (key, time): the merge is then one
  // forward pass — no window frame, no union, no second sort
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val nRight = rOut.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      // bind against the nullability-widened OUTPUT schema (as Spark's
      // outer joins do): binding against lOut ++ rOut keeps right-side
      // columns non-nullable when the child schema says so, and the
      // generated writer then skips null checks — unmatched left rows
      // would emit 0/false instead of NULL
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // held = latest admissible right row; copied out of the iterator's
      // reused buffer via copyFrom (buffer reuse, no per-row allocation
      // once grown)
      var heldRow: org.apache.spark.sql.catalyst.expressions.UnsafeRow = null
      var heldKey: org.apache.spark.sql.catalyst.expressions.UnsafeRow = null
      def hold(row: InternalRow): Unit = row match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          if (heldRow == null) heldRow = u.copy() else heldRow.copyFrom(u)
          val k = rKeyProj(heldRow)
          if (heldKey == null) heldKey = k.copy() else heldKey.copyFrom(k)
        case other => // defensive: non-Unsafe child output (not expected
          // after the required SortExec, which emits UnsafeRows)
          heldRow = UnsafeProjection.create(rOut, rOut)(other).copy()
          heldKey = rKeyProj(heldRow).copy()
      }
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        // SQL join-equality semantics (and DuckDB ASOF): NULL keys and
        // NULL times never match — a null-keyed/timed left row emits the
        // null-extended output without touching the right cursor
        if (lk.anyNull || lTimeRow.isNullAt(0)) {
          outProj(joined(lRow, nullRight))
        } else {
          val lt = lTimeRow.getLong(0)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            if (rk.anyNull) rBuf.next() // null right keys never match
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rBuf.next() // before this key group: discard
              else if (c == 0) {
                val rTimeRow = rTimeProj(rBuf.head)
                if (rTimeRow.isNullAt(0)) rBuf.next() // null time: no match
                else if (rTimeRow.getLong(0) <= lt) hold(rBuf.next())
                else advance = false
              } else advance = false
            }
          }
          val rightSide: InternalRow =
            if (heldRow != null && keyOrd.compare(heldKey, lk) == 0) heldRow
            else nullRight
          outProj(joined(lRow, rightSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public face: `AsofJoinNative.asof(left, right, ...)` — resolves the
  * key/time columns, registers [[AsofJoinStrategy]] in the session's
  * `experimental.extraStrategies` if absent (idempotent; the
  * [[GraftExtensions]] deployment path injects it cluster-wide), and
  * returns the DataFrame of the custom node. Right-side columns must
  * not collide with left-side names — rename before the call.
  */
object AsofJoinNative {
  def asof(left: DataFrame, right: DataFrame, leftKeys: Seq[String],
           rightKeys: Seq[String], leftTime: String,
           rightTime: String): DataFrame = {
    require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
      "as-of join needs matching, non-empty key lists")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column '$n' not found among ${p.output.map(_.name)}"))
    val lt = attr(lp, leftTime)
    val rt = attr(rp, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LongType (epoch), got " +
        s"${lt.dataType} / ${rt.dataType}")
    val node = AsofJoinNode(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)), lt, rt)
    org.apache.spark.sql.graftshim.DatasetBridge.ofRows(spark, node)
  }
}
