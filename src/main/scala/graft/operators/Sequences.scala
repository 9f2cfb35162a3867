package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavior-sequence dataset construction: per-entity ordered event
  * sequences capped at a fixed length — the export a next-event-
  * prediction / session-modeling training job consumes (each row is one
  * training example: the entity's first `maxLen` events in time order,
  * plus the untruncated count for loss masking and coverage stats).
  *
  * Scale shape: the per-key TRUNCATION runs BEFORE the per-key
  * collection — a rank-filter window (row_number ≤ maxLen) that Spark
  * plans as WindowGroupLimit, streaming each key's sorted run with
  * per-partition limits and spill support — so the collect_list buffer
  * that follows is bounded at maxLen rows for EVERY key. Collecting
  * first and slicing after would hold a hot entity's entire history
  * (millions of events) in one aggregation buffer — the q92
  * collect_set-vs-bounded-agg lesson at the sequence level. Both
  * aggregates key on the same column, so the count and the sequence
  * co-partition into the final join without an extra exchange pattern.
  */
object Sequences {

  /** One row per key: (keyCol, n_events — untruncated, seq — the first
    * `maxLen` `valCol` values ordered by (tsCol, idCol), as an array).
    * Ordering is total (the id breaks timestamp ties), so the emitted
    * sequence is deterministic under any partitioning. */
  def eventSequences(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, maxLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLen >= 1, s"maxLen=$maxLen must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val limited = events
      .select(col(keyCol), col(tsCol), col(idCol), col(valCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
    val seqs = limited
      .groupBy(col(keyCol))
      .agg(expr(s"transform(array_sort(collect_list(struct(" +
        s"$tsCol, $idCol, $valCol))), e -> e.$valCol)").as("seq"))
    val totals = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"))
    totals.join(seqs, Seq(keyCol))
      .select(col(keyCol), col("n_events"), col("seq"))
  }
}
