package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The k smallest DISTINCT values of a column, emitted as an ascending
  * array — a buffer-bounded, mergeable replacement for
  * `slice(sort_array(collect_set(c)), 1, k)`.
  *
  * Why not collect_set + slice: `slice` caps only the OUTPUT row; the
  * collect_set aggregation buffer underneath still accumulates every
  * distinct value of the group before the slice runs. For a posting
  * list keyed by token, a stopword's buffer is O(corpus documents) in a
  * single aggregation state — at 100 TB that is an executor OOM, not a
  * slow query. Here the buffer itself never exceeds k elements: inserts
  * into a full buffer either displace the current maximum or are
  * rejected, and "k smallest of a union = k smallest of the pooled
  * bounded sets" makes the partial/final merge exact.
  *
  * Like [[KmvSketchAgg]] (the same discipline specialized to 60-bit
  * hash sketches) it partial-merges map-side on the
  * ObjectHashAggregateExec path, so each map task contributes at most
  * k values per group to the exchange.
  *
  * Supports LongType and StringType children — the two id shapes a
  * corpus uses. UTF8String inputs are cloned on insert (eval buffers
  * are reused row-to-row), and string order is binary — the same
  * ordering Spark's sort_array and the DuckDB oracle's default
  * collation apply to ASCII ids.
  */
case class BoundedMinSetAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[AnyRef]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k=$k must be >= 1")

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_min_set supports BIGINT and STRING inputs, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[AnyRef] =
    new java.util.TreeSet[AnyRef]() // natural order: boxed Long / UTF8String

  @inline private def lessThan(a: AnyRef, b: AnyRef): Boolean =
    a.asInstanceOf[Comparable[AnyRef]].compareTo(b) < 0

  private def add(buffer: java.util.TreeSet[AnyRef], v: AnyRef): Unit = {
    // reject early when already full of smaller values: add+trim on a
    // full buffer allocates and rebalances per row; last() is O(log k)
    if (buffer.size < k || lessThan(v, buffer.last())) {
      buffer.add(v)
      if (buffer.size > k) { buffer.pollLast(); () }
    }
  }

  override def update(buffer: java.util.TreeSet[AnyRef],
      input: InternalRow): java.util.TreeSet[AnyRef] = {
    child.eval(input) match {
      case null => // nulls don't contribute postings
      case s: UTF8String =>
        // test acceptance BEFORE cloning: a full buffer of smaller ids
        // (the stopword case) must not pay one byte-array copy per
        // corpus row — clone only values that actually enter the set
        if (buffer.size < k || lessThan(s, buffer.last()))
          add(buffer, s.clone()) // detach from the reused eval buffer
      case v: AnyRef => add(buffer, v)
      case v => add(buffer, v.asInstanceOf[AnyRef]) // unreachable: eval boxes
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[AnyRef],
      other: java.util.TreeSet[AnyRef]): java.util.TreeSet[AnyRef] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  /** Ascending array of the ≤k smallest distinct values. */
  override def eval(buffer: java.util.TreeSet[AnyRef]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: java.util.TreeSet[AnyRef]): Array[Byte] =
    child.dataType match {
      case LongType =>
        val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
        bb.putInt(buffer.size)
        val it = buffer.iterator()
        while (it.hasNext) bb.putLong(it.next().asInstanceOf[java.lang.Long])
        bb.array()
      case _ =>
        val strs = new Array[Array[Byte]](buffer.size)
        var bytes = 0
        val it = buffer.iterator()
        var i = 0
        while (it.hasNext) {
          strs(i) = it.next().asInstanceOf[UTF8String].getBytes
          bytes += strs(i).length
          i += 1
        }
        val bb = ByteBuffer.allocate(4 + 4 * strs.length + bytes)
        bb.putInt(strs.length)
        strs.foreach { s => bb.putInt(s.length); bb.put(s) }
        bb.array()
    }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[AnyRef] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[AnyRef]()
    var i = 0
    child.dataType match {
      case LongType =>
        while (i < n) { set.add(java.lang.Long.valueOf(bb.getLong)); i += 1 }
      case _ =>
        while (i < n) {
          val len = bb.getInt
          val s = new Array[Byte](len)
          bb.get(s)
          set.add(UTF8String.fromBytes(s))
          i += 1
        }
    }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinSetAgg =
    copy(child = newChild)
}
