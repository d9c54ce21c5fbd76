package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native KMV bottom-k aggregate: `kmv_lows(hash, k)` keeps the k
  * smallest DISTINCT longs per group in a single pass and returns them
  * ascending as `array<bigint>`.
  *
  * This is the aggregate-expression face of
  * [[graft.operators.Sketches.kmvSketch]] and the scale-path variant:
  * the row formulation must first `distinct()` every value (a shuffle
  * of the full distinct domain) before the windowed bottom-k, whereas
  * a [[TypedImperativeAggregate]] bounds the map-side partial at k
  * longs per group per partition — the exchange carries sketches, not
  * the domain. At 100 TB per-group distinct domains, that is the
  * difference between shuffling billions of rows and shuffling
  * `groups × k × 8` bytes. Merge is "union, re-take the k smallest" —
  * associative and commutative, so partial combine order is
  * irrelevant and the result is engine-deterministic for a
  * deterministic hash (the md5-derived
  * [[graft.operators.Sketches.hash48]]).
  *
  * The buffer is a bounded `java.util.TreeSet` (distinctness + order;
  * ≤ k elements, so updates are O(log k) with O(k) memory). NULL
  * inputs are skipped (SQL aggregate semantics); an empty group
  * yields an empty array, never NULL.
  */
case class KmvLowsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_lows(k) must be >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      add(buf, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values already above a full sketch's max — O(log k) probe,
    // no churn on the common path where most hashes miss the sketch
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_lows needs a BIGINT hash column, got ${other.simpleString(100)}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvLowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvLowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvLowsAgg =
    copy(child = newChild)

  override def prettyName: String = "kmv_lows"
}

object KmvLowsAgg {
  /** Column API: the k smallest distinct values of `hash` per group,
    * ascending. Pair with [[graft.operators.Sketches.hash48]] for the
    * KMV distinct-count sketch.
    */
  def kmvLows(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvLowsAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** SQL registration: `SELECT kmv_lows(h, 64) FROM … GROUP BY …`.
    * The builder returns the bare [[KmvLowsAgg]] — the analyzer wraps
    * AggregateFunctions in AggregateExpression itself.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_lows",
      exprs => KmvLowsAgg(exprs.head,
        GraftExtensions.intArg("kmv_lows", "k", exprs(1))),
      "scala_udf")
}
