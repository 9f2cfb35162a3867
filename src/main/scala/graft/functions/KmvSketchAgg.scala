package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k minimum values) sketch as a native aggregate function: keeps
  * the k smallest DISTINCT values of a long hash column, emitted as an
  * ascending array — the sketch [[graft.operators.Sketch.kmvDistinct]]
  * assembles with a distinct + window + group chain.
  *
  * Why an aggregate expression: the composed form shuffles every
  * distinct (group, hash) pair twice (the DISTINCT aggregation, then
  * the per-group WindowGroupLimit sort). This aggregate partial-merges
  * map-side like any HashAggregate — each map task contributes at most
  * k longs per group to the exchange, so the shuffle volume is
  * O(tasks · groups · k) regardless of corpus cardinality. At 100 TB
  * that is the difference between shuffling every distinct member and
  * shuffling a few KB per group. KMV sketches are trivially mergeable
  * (the k smallest of a union = the k smallest of the pooled sketches),
  * which is exactly the partial/final split.
  *
  * The buffer is a sorted distinct set bounded at k+spill; it rides
  * ObjectHashAggregateExec (the TypedImperativeAggregate path — same as
  * Spark's own collect_list/percentile), so it stays in the hash-agg
  * fast path rather than SortAggregate.
  *
  * Bit-parity: values are inserted verbatim — callers feed the portable
  * 60-bit md5 hash ([[graft.operators.Sketch.hash60]]), so the emitted
  * sketch is reproducible in any engine with the same hash (the DuckDB
  * oracle of q82/q89 builds it in plain SQL).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k=$k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  // AbstractDataType went private[sql] in Spark 4, so the ExpectsInputTypes
  // route is closed to external packages — validate the child type directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a BIGINT hash input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // reject early when already full of smaller values: add+trim on a
    // full buffer allocates and rebalances per row; last() is O(log k)
    if (buffer.size < k || v < buffer.last()) {
      buffer.add(v)
      if (buffer.size > k) { buffer.pollLast(); () }
    }
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  /** Ascending array of the ≤k smallest distinct hashes. */
  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
