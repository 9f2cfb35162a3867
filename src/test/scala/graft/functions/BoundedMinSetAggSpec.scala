package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** The r5 scale-killer fix: q92's posting lists used collect_set+slice,
  * whose aggregation buffer holds every distinct doc id of a hot token
  * before the slice runs — O(corpus docs) state for a stopword at
  * 100 TB. BoundedMinSetAgg's buffer itself is capped at k; these tests
  * pin (a) exact equivalence with the collect_set form, (b) the buffer
  * bound — the property the slice form silently lacked — and (c)
  * merge/partition invariance.
  */
class BoundedMinSetAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def boundedSet(c: org.apache.spark.sql.Column, k: Int) =
    Bridge.column(BoundedMinSetAgg(
      Bridge.expression(c), k).toAggregateExpression())

  test("equals slice(sort_array(collect_set)) on long ids") {
    val toks = docs
      .select(col("doc_id"),
        explode(graft.operators.Dedup.words(col("text"))).as("token"))
    val viaSet = toks.groupBy("token")
      .agg(slice(sort_array(collect_set(col("doc_id"))), 1, 5).as("p"))
    val viaBounded = toks.groupBy("token")
      .agg(boundedSet(col("doc_id"), 5).as("p"))
    val joined = viaSet.alias("a").join(viaBounded.alias("b"), "token")
      .select(col("a.p").as("pa"), col("b.p").as("pb"))
    assert(joined.count() > 10) // the sf0.001 corpus has ~31 distinct tokens
    assert(joined.filter(col("pa") =!= col("pb")).count() == 0)
  }

  test("equals slice(sort_array(collect_set)) on string ids") {
    val byStr = docs.select(
      concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0")).as("sid"),
      col("lang"))
    val viaSet = byStr.groupBy("lang")
      .agg(slice(sort_array(collect_set(col("sid"))), 1, 7).as("p"))
    val viaBounded = byStr.groupBy("lang")
      .agg(boundedSet(col("sid"), 7).as("p"))
    val joined = viaSet.alias("a").join(viaBounded.alias("b"), "lang")
      .select(col("a.p").as("pa"), col("b.p").as("pb"))
    assert(joined.count() > 0)
    assert(joined.filter(col("pa") =!= col("pb")).count() == 0)
  }

  test("aggregation buffer never exceeds k elements (the slice form's gap)") {
    val agg = BoundedMinSetAgg(BoundReference(0, LongType, nullable = false), 8)
    val buf = agg.createAggregationBuffer()
    // stream 10k distinct values in descending order — worst case for a
    // naive top-k (every early value is provisionally kept)
    (10000L to 1L by -1L).foreach { v =>
      agg.update(buf, InternalRow(v))
      assert(buf.size <= 8, s"buffer grew to ${buf.size} after $v")
    }
    assert(agg.serialize(buf).length == 4 + 8 * 8,
      "serialized partial state must be O(k), not O(distinct inputs)")
    import scala.jdk.CollectionConverters._
    assert(buf.asScala.toSeq.map(_.asInstanceOf[java.lang.Long].longValue())
      == (1L to 8L))
  }

  test("string buffers clone out of the eval row and stay bounded") {
    val agg = BoundedMinSetAgg(BoundReference(0, StringType, nullable = true), 3)
    val buf = agg.createAggregationBuffer()
    Seq("m", "c", null, "z", "a", "c", "b").foreach { s =>
      agg.update(buf, InternalRow(
        if (s == null) null else UTF8String.fromString(s)))
    }
    assert(agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.toString).toSeq == Seq("a", "b", "c"))
    // merge of two bounded partials is the bounded set of the union
    val other = agg.createAggregationBuffer()
    Seq("aa", "ab").foreach(s =>
      agg.update(other, InternalRow(UTF8String.fromString(s))))
    val merged = agg.merge(
      agg.deserialize(agg.serialize(buf)),
      agg.deserialize(agg.serialize(other)))
    assert(agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.toString).toSeq == Seq("a", "aa", "ab"))
  }

  test("partition count does not change the result (mergeable partials)") {
    val toks = docs
      .select(col("doc_id"),
        explode(graft.operators.Dedup.words(col("text"))).as("token"))
    def run(parts: Int) = toks.repartition(parts).groupBy("token")
      .agg(boundedSet(col("doc_id"), 4).as("p"))
      .orderBy("token").collect().toSeq
    assert(run(1) == run(13))
  }

  test("bounded_min_set works as a registered SQL aggregate") {
    graft.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("bms_docs")
    val rows = spark.sql(
      "SELECT lang, bounded_min_set(doc_id, 3) AS p FROM bms_docs GROUP BY lang")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](r.fieldIndex("p")).size == 3))
  }
}
