package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Engine-portable sketches. HLL (q33/q70's approx_* functions) is
  * gate-checkable only against its own exact twin because its register
  * layout is engine-private; these sketches are built from md5
  * arithmetic BOTH engines compute bit-identically, so the sketch
  * itself — not just a bounds flag — is oracle-comparable.
  *
  *  - KMV (k minimum values) distinct-count: keep the k smallest
  *    60-bit hashes per group; estimate = (k-1)·2⁶⁰ / h_k. Mergeable
  *    (union of sketches = sketch of union), 8k bytes per group,
  *    rsd ≈ 1/√(k−2) (~13% at k=64).
  *  - Priority sampling (Duffield et al.): weight-proportional sample
  *    with NO RNG — priority = w·2⁶⁰/(h+1) from the row's own hash.
  *    Deterministic, append-stable, and free of transcendentals (the
  *    classic exponential-key method needs ln/pow, whose last-ulp
  *    behavior differs across math libraries — this formulation is
  *    division-only, so any engine reproduces the exact sample).
  */
object Sketch {

  /** 60-bit uniform hash of a column's string form (the portable
    * md5-prefix idiom used across the suite). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV sketch + estimate per group. Output: (groupCol, n_sketch,
    * kth_hash, kmv_estimate, exact_distinct, within_50pct). The
    * shuffle carries DISTINCT (group, hash) pairs — at most one row
    * per distinct member, pruned to k per group by WindowGroupLimit;
    * when a group has fewer than k distinct members the sketch IS the
    * exact count. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val hashed = df
      .select(col(groupCol), hash60(col(valueCol)).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc)
    val sketch = hashed
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
      .withColumn("kmv_estimate",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("kth_hash").cast("double")))
    val exact = df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))
    sketch.join(exact, groupCol)
      .withColumn("within_50pct",
        abs(col("kmv_estimate") - col("exact_distinct").cast("double")) <
          col("exact_distinct").cast("double") * 0.5)
  }

  /** [[kmvDistinct]] rebuilt on the native [[graft.functions.KmvSketchAgg]]
    * aggregate: same output, structurally cheaper plan. The composed
    * form shuffles every distinct (group, hash) pair twice (DISTINCT
    * agg + per-group window sort); here the sketch partial-merges
    * map-side, so the exchange carries at most k longs per (task,
    * group) — O(tasks·groups·k) shuffle volume independent of member
    * cardinality (KmvAggSpec measures the gap with a listener). The
    * exact count_distinct twin stays for the accuracy column, as in
    * the composed form. */
  def kmvDistinctNative(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val agg = Bridge.column(
      graft.functions.KmvSketchAgg(
        Bridge.expression(hash60(col(valueCol))), k).toAggregateExpression())
    val sketch = df
      .groupBy(col(groupCol))
      .agg(agg.as("kmv"))
      .select(col(groupCol),
        size(col("kmv")).cast("long").as("n_sketch"),
        element_at(col("kmv"), -1).as("kth_hash"))
      .withColumn("kmv_estimate",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("kth_hash").cast("double")))
    val exact = df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))
    sketch.join(exact, groupCol)
      .withColumn("within_50pct",
        abs(col("kmv_estimate") - col("exact_distinct").cast("double")) <
          col("exact_distinct").cast("double") * 0.5)
  }

  /** Priority sample of n rows, inclusion probability ∝ weight.
    * Output: input columns + (pri, rnk). The global top-n runs as
    * TakeOrderedAndProject (per-partition heaps, no full sort, no
    * single-partition window over the corpus — the q58 discipline);
    * the rank window then sees only the n survivors. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    val ord = Seq(col("pri").desc, col(idCol).asc)
    val top = df
      .withColumn("pri",
        col(weightCol).cast("double") * lit(1152921504606846976.0) /
          (hash60(col(idCol)) + lit(1L)).cast("double"))
      .orderBy(ord: _*)
      .limit(n)
    top.withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
  }
}
