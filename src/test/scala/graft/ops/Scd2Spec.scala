package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  test("scd2: consecutive runs collapse into intervals") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L), (1L, "B", 30L, 102L),
      (1L, "B", 40L, 103L), (1L, "A", 50L, 104L),
      (2L, "X", 10L, 200L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val out = DiffOps.scd2Intervals(log, "user_id", "event_type", "ts_us",
        Seq("ts_us", "event_id"))
      .orderBy("user_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(50L), false),
      (1L, "A", 50L, None, true),
      (2L, "X", 10L, None, true)))
  }

  test("scd2 on real events: intervals tile, one current row per user") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val rows = DiffOps.scd2Intervals(e, "user_id", "event_type", "ts_us",
        Seq("ts_us", "event_id"))
      .orderBy("user_id", "valid_from").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, hist) =>
      // exactly one open interval, and each close matches the next open
      assert(hist.count(_.getBoolean(4)) == 1)
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a.get(3) == b.get(2))
        case _ =>
      }
      // no zero-length or inverted intervals
      hist.init.foreach(r =>
        assert(r.get(3).asInstanceOf[Long] > r.getLong(2)))
    }
    // compaction: strictly fewer interval rows than events
    assert(rows.length < e.count())
  }

  test("pit lookup: containing interval, pre-history null, boundary takes the new state") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, "A", 10L, 100L), (1L, "B", 30L, 101L), (1L, "A", 50L, 102L),
      (2L, "X", 40L, 200L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val dim = DiffOps.scd2Intervals(log, "user_id", "event_type", "ts_us",
      Seq("ts_us", "event_id"))
    val facts = Seq(
      (1L, 1000L, 5L),   // before any interval -> NULL state
      (1L, 1001L, 10L),  // exactly at first valid_from -> A
      (1L, 1002L, 30L),  // exactly at a change boundary -> the NEW state B
      (1L, 1003L, 49L),  // mid second interval -> B
      (1L, 1004L, 99L),  // in the open current interval -> A
      (2L, 2000L, 41L),  // other entity -> X
      (3L, 3000L, 10L))  // unknown entity -> NULL
      .toDF("user_id", "event_id", "ts_us")
    val out = DiffOps.pitLookup(facts, dim, "user_id", "ts_us")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(1), Option(r.getAs[String]("event_type"))))
    assert(out.length == facts.count(), "fact count preserved (≤1 interval matches)")
    assert(out.toSeq == Seq(
      (1000L, None), (1001L, Some("A")), (1002L, Some("B")),
      (1003L, Some("B")), (1004L, Some("A")),
      (2000L, Some("X")), (3000L, None)))
  }

  test("pit lookup rejects fact columns colliding with the dim payload") {
    val s = spark
    import s.implicits._
    val log = Seq((1L, "A", 10L, 100L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val dim = DiffOps.scd2Intervals(log, "user_id", "event_type", "ts_us",
      Seq("ts_us", "event_id"))
    // a fact frame already carrying valid_from would yield ambiguous
    // duplicate output columns — must fail eagerly instead
    val facts = Seq((1L, 20L, 5L))
      .toDF("user_id", "ts_us", "valid_from")
    val e = intercept[IllegalArgumentException] {
      DiffOps.pitLookup(facts, dim, "user_id", "ts_us")
    }
    assert(e.getMessage.contains("valid_from"), e.getMessage)
  }

  test("scd2 plans one entity shuffle for both windows") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val plan = DiffOps.scd2Intervals(e, "user_id", "event_type", "ts_us",
        Seq("ts_us", "event_id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single entity shuffle:\n$plan")
  }
}
