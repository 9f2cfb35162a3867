package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencesSpec extends SparkSpec {

  test("sequences: time-ordered, id tie-break, truncated with full count kept") {
    val s = spark
    import s.implicits._
    val evs = Seq(
      // user 1: 5 events, ts tie between ids 11 and 12
      (1L, 10L, "a"), (1L, 11L, "c"), (1L, 11L, "b"), (1L, 13L, "d"),
      (1L, 14L, "e"),
      // user 2: single event
      (2L, 20L, "z"))
      .toDF("user_id", "ts_raw", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_raw") * 1000000L))
      .withColumn("event_id", monotonically_increasing_id())
    // deterministic ids for the tie: rebuild with explicit event ids
    val fixed = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 102L, "c"), (1L, 11L, 101L, "b"),
      (1L, 13L, 103L, "d"), (1L, 14L, 104L, "e"), (2L, 20L, 105L, "z"))
      .toDF("user_id", "ts_raw", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_raw") * 1000000L))
    val out = Sequences.eventSequences(fixed, "user_id", "ts", "event_id",
        "event_type", maxLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[String](2).toList)).toMap
    // ts tie at 11: event 101 ("b") precedes 102 ("c")
    assert(out(1L) == (5L, List("a", "b", "c")),
      s"user 1 got ${out(1L)}")
    assert(out(2L) == (1L, List("z")))
    assert(evs.count() == 6) // silence unused warning path
  }

  test("sequences: truncation plans WindowGroupLimit; repartition-invariant") {
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val seqs = Sequences.eventSequences(evs, "user_id", "ts", "event_id",
      "event_type", maxLen = 10)
    val plan = seqs.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must plan the streaming group limit:\n$plan")
    val a = seqs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList))
      .sortBy(_._1)
    a.foreach { case (_, n, sq) =>
      assert(sq.length == math.min(n, 10L).toInt)
    }
    val b = Sequences.eventSequences(evs.repartition(17), "user_id", "ts",
        "event_id", "event_type", maxLen = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
