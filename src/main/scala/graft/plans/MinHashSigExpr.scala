package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the MinHash signature — one pass over
  * the shingle array: md5 digest per shingle (first 4 bytes big-endian,
  * mod the Mersenne prime 2^31−1) feeding `numHashes` universal-hash
  * minima in a tight primitive loop. Value-identical to the declarative
  * formulation in [[graft.operators.TextDedup.minhashBase]] +
  * `minhashSignature` (spec-pinned), which routes every shingle through
  * md5-hex → substring → conv → cast string machinery; this expression
  * replaces that per-shingle UTF8String churn with digest bytes.
  *
  * `CodegenFallback` keeps surrounding operators inside whole-stage
  * codegen; the hashing itself dominates the eval cost.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = graft.operators.TextDedup.MinhashPrime
  private val params: Array[(Long, Long)] =
    Array.tabulate(numHashes)(graft.operators.TextDedup.minhashParams)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got ${other.simpleString(100)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex digits == first 4 bytes big-endian, unsigned
        val h = (((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)) % P
        var j = 0
        while (j < numHashes) {
          val v = (h * params(j)._1 + params(j)._2) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    // empty/all-null input: each min is null (array_min-over-empty parity)
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = if (mins(j) == Long.MaxValue) null else java.lang.Long.valueOf(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Column API. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numHashes))
}
