package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.SparkSpec

class VecSumAggSpec extends SparkSpec {

  private def vsum = Bridge.column(
    VecSumAgg(Bridge.expression(col("v"))).toAggregateExpression())

  test("sums arrays element-wise, exactly, across many partitions") {
    import spark.implicits._
    // integral doubles: sums are exact regardless of fold order, so the
    // result must be bit-identical however Spark partitions the input
    val rows = (1 to 1000).map(i =>
      ("g" + (i % 3), Array(i.toDouble, (2 * i).toDouble, 1.0)))
    val df = rows.toDF("g", "v").repartition(13)
    val got = df.groupBy("g").agg(vsum.as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = rows.groupBy(_._1).view.mapValues(vs =>
      vs.map(_._2).transpose.map(_.sum).toSeq).toMap
    assert(got == want)
  }

  test("null arrays are skipped; all-null group yields null") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(Array(1.0, 2.0))),
      ("a", None),
      ("b", None)).toDF("g", "v")
    val got = df.groupBy("g").agg(vsum.as("s"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").isDefined)
    assert(got("b").isEmpty)
  }

  test("zero-length input vector fails loudly (empty = no-rows sentinel)") {
    import spark.implicits._
    val df = Seq(("a", Array.empty[Double]), ("a", Array(1.0, 2.0)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(vsum.as("s")).collect()
    }
    assert(e.getMessage != null)
  }

  test("dimension mismatch fails loudly instead of truncating") {
    import spark.implicits._
    val df = Seq(("a", Array(1.0)), ("a", Array(1.0, 2.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(vsum.as("s")).collect()
    }
    assert(e.getMessage != null)
  }

  test("native aggregate shuffles far fewer records than the posexplode form") {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    def shuffled(body: => Unit): Long = {
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
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") % 7).as("g"),
        graft.operators.Ivf.quantize(col("embedding"))
          .cast("array<double>").as("v"))
      .repartition(8)
      .persist()
    emb.count() // materialize: the repartition shuffle stays OUT of both measurements
    try {
      val native = shuffled {
        emb.groupBy("g").agg(vsum.as("s")).count(): Unit
      }
      val composed = shuffled {
        emb.select(col("g"), posexplode(col("v")).as(Seq("d", "x")))
          .groupBy("g", "d").agg(sum("x")).count(): Unit
      }
      // native partial-merges whole arrays map-side: one array per
      // (task, group) vs the exploded form's (task, group, dim) rows
      assert(native * 10 <= composed,
        s"native shuffled $native records vs composed $composed")
    } finally { emb.unpersist(); () }
  }

  test("matches the posexplode-composed centroid sums on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") % 7).as("g"),
        // quantize emits ARRAY<BIGINT> (floor); the aggregate takes doubles
        graft.operators.Ivf.quantize(col("embedding"))
          .cast("array<double>").as("v"))
    val native = emb.groupBy("g").agg(vsum.as("s"))
      .select(col("g"), posexplode(col("s")).as(Seq("d", "x")))
    val composed = emb
      .select(col("g"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("g", "d").agg(sum("x").as("x"))
    assert(native.except(composed).count() == 0)
    assert(composed.except(native).count() == 0)
  }
}
