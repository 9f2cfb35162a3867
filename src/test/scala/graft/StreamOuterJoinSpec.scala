package graft

import org.apache.spark.sql.functions._

/** Left-outer stream-stream interval join: unmatched probe rows must
  * surface with null build columns once the watermark has closed their
  * window (flushed by the trailing no-data micro-batch), and matched
  * rows must equal the inner join. Hand-built event log so the
  * match/no-match split is known exactly. */
class StreamOuterJoinSpec extends SparkSpec {

  private def ns(minutes: Long): Long = minutes * 60L * 1000000000L

  test("unmatched errors emit null click columns; matched equal inner join") {
    val s = spark
    import s.implicits._
    // user 1: click at t=10m, error at t=30m  -> matched (within 1h)
    // user 2: error at t=40m, no click        -> outer row, null click
    // user 3: click at t=5m, error at t=80m   -> NOT matched (gap > 1h)
    // clip at t=120m; late ticks at t=600m on BOTH sides drive each
    // side's watermark past every retained window so outer state
    // provably closes before the drain ends (the late error itself is
    // clipped out of the output)
    val rows = Seq(
      (1L, ns(10), 1L, "click", 1.5, "{}"),
      (2L, ns(30), 1L, "error", 0.0, "{}"),
      (3L, ns(40), 2L, "error", 0.0, "{}"),
      (4L, ns(5), 3L, "click", 2.5, "{}"),
      (5L, ns(80), 3L, "error", 0.0, "{}"),
      (6L, ns(600), 9L, "error", 0.0, "{}"),
      (7L, ns(600), 9L, "click", 0.0, "{}"))
    // the harness symlinks "<dir>/events.parquet" as a single FILE
    // (mirroring the testdata layout), so extract the one part file
    val dir = tmpDir("souter")
    val staging = s"$dir/staging"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val out = graft.streaming.StreamingOps
      .clickErrorLeftJoinAvailableNow(spark, dir, "souter_sink",
        endExclusive = "1970-01-01 02:00:00")
      .orderBy(col("user_id"), col("err_id"))
      .collect()

    assert(out.length == 3, out.mkString("\n"))
    val byUser = out.map(r => r.getLong(0) -> r).toMap
    assert(byUser(1L).getLong(3) == 1L)      // matched click_id
    assert(byUser(1L).getDouble(4) == 1.5)
    assert(byUser(2L).isNullAt(3), "user 2 must emit an outer null row")
    assert(byUser(3L).isNullAt(3), "user 3's click is outside the hour")

    // a clip the final watermark never reached must FAIL LOUDLY (r5
    // advice): errors in [watermark, clip) still sit in join state, so
    // returning quietly would silently drop their outer rows. Final
    // watermark here = 10:00 late ticks − 1 h delay = 09:00; ask for
    // 09:30 and the guard must reject the drain.
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps
        .clickErrorLeftJoinAvailableNow(spark, dir, "souter_sink_bad",
          endExclusive = "1970-01-01 09:30:00")
    }
    assert(e.getMessage.contains("watermark"), e.getMessage)
  }
}
