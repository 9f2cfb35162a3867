package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.streaming.StreamingOps

/** Streaming + stateful ops under the oracle gate. q29 sessionizes with
  * the flatMapGroupsWithState operator (batch invocation — identical
  * code path runs on a stream); q30 runs a real Structured Streaming
  * query (file source → watermark → windowed agg → memory sink) and is
  * checked against the same SQL as the batch windowed agg — streaming/
  * batch parity is the assertion.
  */
object StreamingQueries extends QueryPack {

  // ---------------------------------------------------------------- q29
  // Keyed-state sessionization (30-min gap), verified against the pure
  // window-function formulation in SQL.
  private val q29 = Q(
    "q29_sessionize",
    (s, dir) => {
      import s.implicits._
      val evs = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .as[StreamingOps.Ev]
      StreamingOps.sessionize(evs, gapMicros = 1800L * 1000000L)
        .toDF()
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM (
          SELECT user_id, event_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev_ts
          FROM events))
      ORDER BY user_id, event_id
    """))

  // ---------------------------------------------------------------- q30
  // Structured Streaming hourly windows (1h watermark, AvailableNow,
  // complete mode) — must equal the batch time-bucket aggregation.
  private val q30 = Q(
    "q30_stream_hourly",
    (s, dir) => {
      StreamingOps.hourlyAggAvailableNow(s, dir, "q30_stream_hourly_sink")
        .orderBy(col("bucket_start"), col("event_type"))
    },
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(14,2))) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket_start, event_type
    """))

  def all: Seq[Q] = Seq(q29, q30)
}
