package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom whole-operator path: AsOfJoinNode (logical) →
  * AsOfJoinStrategy (planner) → BroadcastAsOfJoinExec (physical). */
class BroadcastAsOfJoinSpec extends SparkSpec {

  private def events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_id"), col("value"), col("event_type"))

  test("broadcastAsOf: hand-checked semantics incl. ties, firsts, misses") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 1L), (1L, 50L, 2L), (1L, 10L, 3L),
      (2L, 100L, 4L)).toDF("k", "ts_us", "id")
    val right = Seq((1L, 50L, 5.0), (1L, 80L, 8.0), (3L, 10L, 9.9))
      .toDF("k", "ts_us", "v")
    val out = AsOfJoin.broadcastAsOf(left, right, "k", "ts_us", "v")
      .orderBy("id").collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(80L), Some(8.0)),  // latest of two preceding
      (2L, Some(50L), Some(5.0)),  // exact-tie is inclusive
      (3L, None, None),            // nothing precedes
      (4L, None, None)))           // key has no right rows
  }

  test("broadcastAsOf equals the composed union+window as-of") {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    // composed form ties on (key, ts) differently unless the right side
    // is pre-deduped the same way the custom operator does it
    val clicksDedup = clicks.groupBy("user_id", "ts_us")
      .agg(max("value").as("value"))
      .withColumn("event_id", lit(0L))
    val composed = AsOfJoin.asOf(errors, clicksDedup,
        "user_id", "ts_us", "value", "event_id")
      .select("user_id", "event_id", "asof_ts", "asof_value")
      .orderBy("user_id", "event_id").collect().toSeq
    val custom = AsOfJoin.broadcastAsOf(errors, clicks,
        "user_id", "ts_us", "value")
      .select("user_id", "event_id", "asof_ts", "asof_value")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(custom == composed)
  }

  test("custom exec is planned, probe side has no exchange or sort") {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("value"))
    val df = AsOfJoin.broadcastAsOf(errors, clicks, "user_id", "ts_us", "value")
    df.collect()
    // AQE toString prints Final + Initial sections — audit the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    // the ONLY exchange allowed is the build-side (key, ts) dedup
    // aggregation; the probe side reads straight off the scan, unsorted
    // (the composed as-of plans an Exchange + Sort over BOTH sides)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"probe side must not shuffle:\n$plan")
    assert(!plan.contains("Sort "), s"no sort operator expected:\n$plan")
  }

  test("GraftExtensions.register installs the strategy") {
    graft.GraftExtensions.register(spark)
    assert(spark.experimental.extraStrategies
      .contains(graft.plans.AsOfJoinStrategy))
  }
}
