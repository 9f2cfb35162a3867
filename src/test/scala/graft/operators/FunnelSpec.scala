package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked funnel/retention semantics (q97/q98 are oracled; these
  * pin the ORDERING conditions the oracle data may not exercise). */
class FunnelSpec extends SparkSpec {

  test("funnel honors event order: stages only count at-or-after the prior") {
    val fn = graft.SparkEntry.queries("q97_funnel")
    // build a scratch dir with a crafted events table
    val s = spark
    import s.implicits._
    val dir = tmpDir("funnel")
    Seq(
      // user 1: click BEFORE view must not count; chain is 10 -> 20 -> 30
      (1L, "click", 5L), (1L, "view", 10L), (1L, "purchase", 15L),
      (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: views only
      (2L, "view", 40L),
      // user 3: click + purchase but NO view => stage none
      (3L, "click", 50L), (3L, "purchase", 60L))
      .toDF("user_id", "event_type", "ts_us")
      // Tables.events reads `ts` as INT64 epoch NANOS (nanosAsLong)
      .select(col("user_id"), col("event_type"),
        (col("ts_us") * 1000L).as("ts"),
        lit(0L).as("event_id"), lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getString(4))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), "purchase")))
    assert(out(2L) == ((Some(40L), None, None, "view")))
    assert(out(3L) == ((None, None, None, "none")))
  }

  test("retention: offsets are non-negative and cohort day-0 covers all users") {
    val fn = graft.SparkEntry.queries("q98_retention_cohorts")
    val rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0))
    // every user appears in their own cohort's day 0, so summing day-0
    // users across cohorts = total distinct users
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(count_distinct(col("user_id"))).collect().head.getLong(0)
    assert(day0 == users)
  }
}
