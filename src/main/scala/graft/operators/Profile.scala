package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality census a pipeline runs
  * before trusting a new 100 TB drop: per column, null count, exact
  * distinct count, and min/max (string-rendered for a uniform schema).
  *
  * Scale design: ONE aggregation over one scan. The multiple exact
  * COUNT(DISTINCT)s plan as a single Expand (×|cols| row multiplication
  * map-side, combiner-reduced) — one shuffle, not one scan per column.
  * The 1×N metric row is then unpivoted to N rows driver-free via
  * `stack`. At true 100 TB you'd swap exact distinct for
  * approx_count_distinct (the q33/q70 gated pattern); exact is the
  * oracle-comparable form.
  */
object Profile {

  /** (col_name, n_rows, n_nulls, n_distinct, min_val, max_val), one row
    * per profiled column, ordered by col_name. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val stackArgs = cols
      .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }
}
