package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot comparison + completeness ops — the regression-check side
  * of a snapshot pipeline (the reference re-publishes gold daily with
  * no way to answer "what changed?" or "which days are missing?";
  * both are one-plan questions on Spark).
  */
object DiffOps {

  /** Row-level diff of two snapshots on a key: FULL OUTER join, each
    * row classified added / removed / changed / unchanged. The compare
    * uses null-safe equality per column, so a value moving to/from NULL
    * counts as changed (a naive `=!=` would silently call it
    * unchanged). Shuffles once on the key — at scale pre-bucket both
    * snapshots on the key (Bucketing) and the join co-locates. */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    // presence markers, not key-null checks: after the coalescing
    // usingColumns join, referencing a side's key column is ambiguous
    val al = compareCols.foldLeft(
      a.select((keyCols ++ compareCols).map(col): _*))(
      (df, c) => df.withColumnRenamed(c, s"${c}_a"))
      .withColumn("__in_a", lit(true))
    val bl = compareCols.foldLeft(
      b.select((keyCols ++ compareCols).map(col): _*))(
      (df, c) => df.withColumnRenamed(c, s"${c}_b"))
      .withColumn("__in_b", lit(true))
    val same: Column = compareCols
      .map(c => col(s"${c}_a") <=> col(s"${c}_b"))
      .reduceOption(_ && _).getOrElse(lit(true))
    // usingColumns full join coalesces the key columns
    al.join(bl, keyCols, "full_outer")
      .withColumn("diff_status",
        when(col("__in_b").isNull, "removed")
          .when(col("__in_a").isNull, "added")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("__in_a", "__in_b")
  }

  /** SCD2 (slowly-changing-dimension type 2) history build from an
    * event log: collapse consecutive equal values of `attrCol` per
    * entity into validity intervals (valid_from inclusive, valid_to
    * exclusive = next change, NULL while current).
    *
    * One shuffle: both windows partition by the entity, so Catalyst
    * plans a single Exchange + Sort reused by the lag (change
    * detection) and the lead (interval close). `orderCols` must make
    * the per-entity order total — pass a unique tiebreaker (event id)
    * or concurrent equal timestamps make the history nondeterministic.
    * At 100 TB this is the standard event-log → dimension-table
    * compaction: output size is O(changes), not O(events). */
  def scd2Intervals(events: DataFrame, entityCol: String, attrCol: String,
      tsCol: String, orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(wOrd))
      .withColumn("__rn", row_number().over(wOrd))
      // null-safe: first row by row_number (not __prev.isNull, which
      // conflates it with prev-value-was-NULL), change by !(a <=> b)
      // so A->NULL and NULL->A both count as changes and NULL runs
      // collapse like any other run
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__rn")
      .select(col(entityCol), col(attrCol), col(tsCol).as("valid_from"),
        // two changes inside one timestamp tick still need a total
        // order for the interval close — reuse the caller's tiebreaker
        col(orderCols.last).as("__tb"))
    val wIv = Window.partitionBy(col(entityCol))
      .orderBy(col("valid_from").asc, col("__tb").asc)
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wIv))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tb")
  }

  /** Point-in-time lookup against an SCD2 dimension: each fact row
    * picks up the interval (from [[scd2Intervals]]'s output shape:
    * entityCol, attr, valid_from, valid_to, is_current) that contains
    * its timestamp — valid_from ≤ ts, and ts < valid_to or the
    * interval is current. Intervals tile per entity without overlap,
    * so at most one matches: the left join preserves the fact count
    * exactly (facts before the entity's first interval get NULLs).
    *
    * Scale shape: an equi-join on the entity with the range condition
    * as a post-filter — both sides co-partition on the entity key, the
    * standard plan for PIT enrich (the dimension is O(changes) and
    * often broadcastable besides; Catalyst picks broadcast when sizes
    * allow). No interval explosion, no range cross join.
    *
    * The dimension's payload columns (everything but `entityCol` and
    * `is_current`) land in the output UNDER THEIR OWN NAMES, so they
    * must not collide with fact columns — a silent collision would
    * produce ambiguous duplicate columns that break downstream
    * resolution. Checked eagerly: pre-select/rename on either side
    * (q112 selects the fact columns it keeps) and re-call. */
  def pitLookup(facts: DataFrame, intervals: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val payloadCols =
      intervals.columns.filterNot(c => c == entityCol || c == "is_current")
    val collisions = facts.columns.toSet
      .intersect(payloadCols.toSet + "__ent")
    require(collisions.isEmpty,
      s"pitLookup: fact columns ${collisions.mkString(", ")} collide " +
        "with the dimension payload; rename or pre-select before joining")
    val dim = intervals.withColumnRenamed(entityCol, "__ent")
    facts.join(dim,
      facts(entityCol) === dim("__ent") &&
        dim("valid_from") <= facts(tsCol) &&
        (dim("valid_to").isNull || facts(tsCol) < dim("valid_to")),
      "left")
      .drop("__ent", "is_current")
  }

  /** Missing members of a dense date spine: which days between `from`
    * and `to` (inclusive) have NO row in `df.dateCol`. The spine is a
    * generated sequence (no driver loop), the probe one anti-join. */
  def dateGaps(df: DataFrame, dateCol: String, from: String,
      to: String): DataFrame = {
    val spark = df.sparkSession
    val spine = spark.range(1)
      .select(explode(sequence(
        lit(from).cast("date"), lit(to).cast("date"),
        expr("INTERVAL 1 DAY"))).as("missing_date"))
    spine.join(
      df.select(col(dateCol).cast("date").as("missing_date")).distinct(),
      Seq("missing_date"), "left_anti")
  }
}
