package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sketch

class KmvSketchAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def orders = spark.read.parquet(s"$dir/orders.parquet")

  private def shuffleRecords(body: => Unit): Long = {
    val acc = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        acc.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var prev = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = acc.get
        if (now == prev) stable += 1 else { stable = 0; prev = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get
  }

  test("native aggregate reproduces the composed KMV sketch exactly") {
    val composed = Sketch.kmvDistinct(orders, "o_orderpriority", "o_custkey", 64)
      .orderBy("o_orderpriority").collect().toSeq
    val native = Sketch.kmvDistinctNative(orders, "o_orderpriority", "o_custkey", 64)
      .orderBy("o_orderpriority").collect().toSeq
    assert(native == composed)
  }

  test("sketch is exact below k (small groups => n_sketch = exact count)") {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val out = Sketch.kmvDistinctNative(nation, "n_regionkey", "n_nationkey", 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_sketch") == r.getAs[Long]("exact_distinct"))
      assert(r.getAs[Double]("kmv_estimate") ==
        r.getAs[Long]("exact_distinct").toDouble)
    }
  }

  test("partial merge across partitions matches a single-partition run") {
    val one = Sketch.kmvDistinctNative(
      orders.repartition(1), "o_orderpriority", "o_custkey", 16)
      .orderBy("o_orderpriority").collect().toSeq
    val many = Sketch.kmvDistinctNative(
      orders.repartition(13), "o_orderpriority", "o_custkey", 16)
      .orderBy("o_orderpriority").collect().toSeq
    assert(one == many)
  }

  test("native sketch shuffles far fewer records than the composed form") {
    // isolate the sketch side (the exact count_distinct twin is common
    // to both forms): composed = distinct pairs shuffled twice; native
    // = ≤ k per (task, group)
    val composed = shuffleRecords {
      orders.select(col("o_orderpriority"),
          Sketch.hash60(col("o_custkey")).as("h")).distinct()
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority")).orderBy(col("h").asc)))
        .filter(col("r") <= 64)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
        .count()
      ()
    }
    val native = shuffleRecords {
      import org.apache.spark.sql.graft.Bridge
      val agg = Bridge.column(KmvSketchAgg(
        Bridge.expression(Sketch.hash60(col("o_custkey"))), 64)
        .toAggregateExpression())
      orders.groupBy("o_orderpriority").agg(agg.as("kmv")).count()
      ()
    }
    assert(native < composed / 4,
      s"native=$native composed=$composed — map-side partial merge " +
        "should collapse the shuffle")
  }

  test("kmv_sketch works as a registered SQL aggregate") {
    graft.GraftExtensions.register(spark)
    orders.createOrReplaceTempView("kmv_orders")
    val rows = spark.sql("""
      SELECT o_orderpriority,
             size(kmv_sketch(CAST(conv(substr(md5(CAST(o_custkey AS STRING)),
                                            1, 15), 16, 10) AS BIGINT), 8)) AS n
      FROM kmv_orders GROUP BY o_orderpriority
    """).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("n") == 8))
  }
}
