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
}
