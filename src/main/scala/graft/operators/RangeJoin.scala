package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — the third temporal join next to
  * [[AsOfJoin]] and the stream-stream interval join: match each fact
  * timestamp to the interval(s) containing it.
  *
  * A naive `ts BETWEEN start AND end` join has no equi-key, so Catalyst
  * plans BroadcastNestedLoopJoin — the shape that stops scaling. The
  * scale-right form BUCKETS time on both sides and joins on the bucket
  * with the range predicate left as a residual: a plain hash join whose
  * probe side never fans out. Requirement: each interval must lie
  * within one bucket (or be exploded to its covered buckets first —
  * [[coveredBuckets]]); pick the bucket width ≥ the max interval span.
  */
object RangeJoin {

  /** Explode an interval frame to one row per covered bucket of width
    * `bucketMicros` (µs), adding `__bucket`. Intervals are [start, end):
    * an interval touching n buckets emits n rows. */
  def coveredBuckets(intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame =
    intervals.select(col("*"),
      explode(sequence(
        unix_micros(col(startCol)) - (unix_micros(col(startCol)) % bucketMicros),
        // last bucket containing a point of [start, end): end is exclusive
        unix_micros(col(endCol)) - 1 -
          ((unix_micros(col(endCol)) - 1) % bucketMicros),
        lit(bucketMicros))).as("__bucket"))

  /** Containment join: facts(tsCol) ∈ [start, end) of bucket-exploded
    * intervals. The interval side is assumed dimension-sized and is
    * broadcast; for big-big range joins drop the hint and let the
    * bucket key shuffle both sides. */
  def containmentJoin(facts: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    val bucketed = coveredBuckets(intervals, startCol, endCol, bucketMicros)
    val ts = col(tsCol)
    facts
      .withColumn("__bucket",
        unix_micros(ts) - (unix_micros(ts) % bucketMicros))
      .join(broadcast(bucketed), Seq("__bucket"), "inner")
      .where(ts >= col(startCol) && ts < col(endCol))
      .drop("__bucket")
  }
}
