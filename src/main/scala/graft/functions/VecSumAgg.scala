package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of double-array columns as a native aggregate.
  *
  * Why: centroid recomputation in [[graft.operators.Ivf]] needs
  * per-dimension sums over every vector assigned to a cluster. The
  * composed form (`posexplode` → groupBy(cid, dim) → re-assemble) first
  * multiplies the row count by the dimension (n·64 rows at dim=64) and
  * shuffles that expanded set every Lloyd iteration — at 100 TB the
  * explode dominates the whole k-means. This aggregate keeps vectors
  * whole: each map task folds its rows into one running Array[Double]
  * per group, so the exchange carries O(tasks · clusters) arrays
  * regardless of corpus size — the canonical map-side-combine shape.
  *
  * Rides ObjectHashAggregateExec (TypedImperativeAggregate, same path
  * as collect_list), staying in the hash-agg fast path.
  *
  * Determinism: callers feed integral-valued doubles (see
  * [[graft.operators.Ivf.quantize]]); integer-valued double sums below
  * 2^53 are exact in IEEE754 and therefore order-independent, so the
  * result is bit-identical across partitionings and engines. NULL
  * arrays are skipped; NULL elements count as 0. The first non-null
  * row fixes the dimension; a later mismatch is a data error and
  * throws rather than silently truncating. A ZERO-LENGTH input array
  * also throws: the empty array is the buffer's "no rows yet" sentinel,
  * so accepting it as data would let a dimension mismatch against it
  * pass silently — and an empty vector in a sum is a data error anyway.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires ARRAY<DOUBLE>, got ${other.sql}")
  }

  // empty array = "no rows yet" sentinel (a real zero-length vector sum
  // is still an empty array, which evaluates to NULL — acceptable: no
  // caller sums zero-dimension vectors)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def fold(buffer: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    require(n > 0,
      "vec_sum: zero-length input vector (empty array is the no-rows " +
        "sentinel and cannot be summed)")
    val acc =
      if (buffer.length == 0) new Array[Double](n)
      else {
        require(buffer.length == n,
          s"vec_sum: dimension mismatch (${buffer.length} vs $n)")
        buffer
      }
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else fold(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 0) buffer
    else if (buffer.length == 0) other
    else {
      require(buffer.length == other.length,
        s"vec_sum: dimension mismatch (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}
