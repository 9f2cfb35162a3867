package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for every left row, the most recent right row
  * with right.ts ≤ left.ts within the same key.
  *
  * Spark has no built-in as-of join; the preference ladder (compose >
  * custom Expression > custom physical operator) stops at COMPOSE: union
  * both sides with a side tag and run ONE window pass per key ordered by
  * (ts, side) carrying the last right value forward. One shuffle on the
  * key — same cost as any windowed op — versus the naive range-join
  * (key-equi join + per-pair max, quadratic within hot keys). This is
  * the standard log-enrichment shape: "attach the latest dimension
  * snapshot at or before the event time".
  */
object AsOfJoin {

  /** leftDf(keyCol, tsCol, left cols...) ⟕asof rightDf(keyCol, tsCol,
    * valueCol): output = left rows + `asof_ts`/`asof_value` of the
    * latest right row at-or-before, nulls when none precedes. Right rows
    * sort before left rows on ts ties (side tag), so an exactly-equal
    * timestamp matches — the conventional inclusive as-of. */
  def asOf(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, tieCol: String): DataFrame = {
    val left = leftDf.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rightDf.schema(valueCol).dataType))
      .withColumn("__rts", lit(null).cast(rightDf.schema(tsCol).dataType))
    val right = rightDf
      .select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("__side", lit(0))
      .withColumn("__rv", col(valueCol))
      .withColumn("__rts", col(tsCol))
      .drop(valueCol)
    val unioned = left.select(
      (leftDf.columns.map(col) :+ col("__side") :+ col("__rv") :+ col("__rts")): _*)
      .unionByName(right, allowMissingColumns = true)
    // tieCol makes the within-frame order total even for equal (ts, side)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_value", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv", "__rts")
  }

  /** The CUSTOM-OPERATOR as-of join ([[graft.plans.AsOfJoinNode]] →
    * [[graft.plans.AsOfJoinStrategy]] → BroadcastAsOfJoinExec): same
    * inclusive at-or-before semantics as [[asOf]], but the right side
    * is broadcast as per-key ts-sorted arrays and the left side is
    * probed by binary search — ZERO shuffle, ZERO sort on the fact
    * side, versus [[asOf]]'s one shuffle+sort of both sides. Use when
    * the right side is dimension-sized (the BroadcastHashJoin
    * condition); at 100 TB that is "attach the latest price/config
    * snapshot to every event" without moving the events.
    *
    * `tsCol` must be BIGINT on both sides (epoch micros, the suite
    * convention). Right (key, ts) ties collapse to max(value) BEFORE
    * the build so the probe is deterministic. Output: left columns +
    * (asof_ts, asof_value). */
  def broadcastAsOf(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      tsCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.LongType

    val spark = leftDf.sparkSession
    // live-session strategy install (idempotent; the node type matches
    // nothing but itself, so other queries are untouched). Synchronized:
    // the read-modify-write would otherwise race with a concurrent
    // builder on the same session (duplicate install / lost update).
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies
          .contains(graft.plans.AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      }
    }

    // the top-level aliases are load-bearing: when both sides read the
    // same relation, the analyzer's DeduplicateRelations re-aliases the
    // duplicate scan's exprIds inside the right subtree — attributes
    // captured from a bare aggregate output would go stale (observed:
    // ATTRIBUTE_NOT_FOUND at execution). Alias OUTPUTS own their
    // exprIds, so the node's right-referencing fields survive the
    // rewrite.
    val rightDedup = rightDf
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
      .select(col(keyCol).as("__asof_key"), col(tsCol).as("__asof_ts"),
        col(valueCol).as("__asof_val"))
    val lPlan = Bridge.analyzed(leftDf)
    val rPlan = Bridge.analyzed(rightDedup)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val (lTs, rTs) = (attr(lPlan, tsCol), attr(rPlan, "__asof_ts"))
    require(lTs.dataType == LongType && rTs.dataType == LongType,
      s"broadcastAsOf needs BIGINT timestamps (epoch micros), got " +
        s"${lTs.dataType.sql} / ${rTs.dataType.sql}")
    val rVal = attr(rPlan, "__asof_val")
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, keyCol), lTs, attr(rPlan, "__asof_key"), rTs, rVal,
      AttributeReference("asof_ts", LongType, nullable = true)(),
      AttributeReference("asof_value", rVal.dataType, nullable = true)())
    Bridge.ofRows(spark, node)
  }
}
