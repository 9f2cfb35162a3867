package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed range join: bucket-cover arithmetic and equivalence with
  * the naive (non-equi) containment join; session_window parity with
  * the manual lag/cumsum sessionization. */
class RangeJoinSpec extends SparkSpec {

  private val HOUR = 3600L * 1000000L

  private lazy val evs = Tables.events(spark, "/root/testdata/sf0.001")

  test("coveredBuckets: within-bucket interval is one row; spanning is two; end-exclusive boundary adds none") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      ("a", "2024-01-01 10:10:00", "2024-01-01 10:50:00"), // inside one hour
      ("b", "2024-01-01 10:30:00", "2024-01-01 11:30:00"), // spans 2 hours
      ("c", "2024-01-01 10:00:00", "2024-01-01 11:00:00")) // end ON boundary
      .toDF("id", "s", "e")
      .select($"id", to_timestamp($"s").as("s"), to_timestamp($"e").as("e"))
    val counts = RangeJoin.coveredBuckets(iv, "s", "e", HOUR)
      .groupBy("id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("containmentJoin ≡ naive non-equi containment join") {
    val s = spark
    import s.implicits._
    val wins = spark.range(5)
      .select((expr("timestamp'2024-01-02 00:00:00'") +
        expr("make_interval(0,0,0, CAST(id AS INT), 0,0,0)")).as("ws"))
      .withColumn("we", expr("ws + INTERVAL 90 MINUTES"))
    val bucketed = RangeJoin.containmentJoin(evs, "ts", wins, "ws", "we", HOUR * 24)
      .select("event_id", "ws").collect().map(r => (r.getLong(0), r.get(1))).toSet
    val naive = evs.join(wins, $"ts" >= $"ws" && $"ts" < $"we")
      .select("event_id", "ws").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty)
  }

  test("containmentJoin plans a hash join, not BroadcastNestedLoopJoin") {
    val wins = spark.range(3)
      .select((expr("timestamp'2024-01-02 02:00:00'") +
        expr("make_interval(0,0,0, CAST(id AS INT), 0,0,0)")).as("ws"))
      .withColumn("we", expr("ws + INTERVAL 2 HOURS"))
    val plan = RangeJoin.containmentJoin(evs, "ts", wins, "ws", "we", HOUR * 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("session_window sessions ≡ manual lag/cumsum session count per user") {
    val s = spark
    import s.implicits._
    val builtin = evs
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("b_sessions"))
    val manual = {
      val e = evs.select($"user_id", $"event_id",
        unix_micros($"ts").as("ts_us")).as[graft.streaming.StreamingOps.Ev]
      graft.streaming.StreamingOps.sessionizeBatch(e, 1800L * 1000000L)
        .groupBy($"user_id").agg(max($"session_seq").as("m_sessions"))
    }
    assert(builtin.join(manual, "user_id")
      .filter($"b_sessions" =!= $"m_sessions").count() === 0)
  }
}
