package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality census a pipeline runs
  * before trusting a new 100 TB drop: per column, null count, exact
  * distinct count, and min/max (string-rendered for a uniform schema).
  *
  * Scale design: TWO aggregation passes, deliberately split. Mixing
  * the COUNT(DISTINCT) rewrite (Expand × |cols| grouping sets) with
  * min/max over STRING columns drags the entire expanded aggregation
  * into SortAggregate (immutable varlen buffers disable the hash fast
  * path) — measured 3.1 s at sf0.1 for the fused form vs well under a
  * second split. Pass 1 (nulls + distincts) keeps long-only buffers →
  * HashAggregate throughout; pass 2 (min/max) has NO grouping keys and
  * no Expand, so its SortAggregate is a sort-free sequential fold. The
  * two 1-row results meet in a constant-size broadcast (audited
  * exception class) and unpivot driver-free via `stack`. At true
  * 100 TB you'd run `exact = false`: approx_count_distinct (HLL++,
  * fixed-size registers, Spark's default rsd = 5%) replaces the
  * COUNT(DISTINCT) expand — one bounded buffer per column instead of a
  * grouping-set per column. Exact is the oracle-comparable form (q81);
  * the approx census is spec-pinned within tolerance of it.
  */
object Profile {

  /** (col_name, n_rows, n_nulls, n_distinct, min_val, max_val), one row
    * per profiled column, ordered by col_name. `exact = false` swaps
    * COUNT(DISTINCT) for approx_count_distinct — the 100 TB mode. */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    def distinctAgg(c: String) =
      if (exact) count_distinct(col(c))
      else approx_count_distinct(col(c))
    val countAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        distinctAgg(c).as(s"nd_$c"))
    } :+ count(lit(1)).as("n_rows")
    val minmaxAggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val counts = df.agg(countAggs.head, countAggs.tail: _*)
    val minmax = df.agg(minmaxAggs.head, minmaxAggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
      .mkString(", ")
    counts.crossJoin(broadcast(minmax))
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }
}
