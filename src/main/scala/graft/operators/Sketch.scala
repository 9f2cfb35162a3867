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
        // try_: an all-NULL group leaves an empty buffer, and ANSI
        // element_at(-1) on an empty array throws instead of NULL
        try_element_at(col("kmv"), lit(-1)).as("kth_hash"))
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

  /** Second 60-bit hash (md5 hex chars 17..31 — the same split
    * [[graft.functions.MinHashSig]] uses), for Kirsch-Mitzenmacher
    * families h_i = (kh1 + i·kh2) mod 2⁶⁰. */
  def hash60b(c: Column): Column =
    conv(substring(md5(c.cast("string")), 17, 15), 16, 10).cast("long")

  private val Mod60 = 1152921504606846976L // 2^60

  /** Count-min sketch heavy hitters: estimate the top keys' frequencies
    * from a d×w counter matrix and compare against exact counts.
    * Output: (keyCol, exact_cnt, est_cnt, overestimates, rnk) for the
    * exact top `topN` keys (rank tie-broken by key).
    *
    * Scale design: the matrix build explodes each row into d (row,
    * bucket) increments, but the groupBy(row, bucket) partial-combines
    * map-side, so each task contributes at most d·w counters to the
    * exchange — the sketch, not the corpus, crosses the wire. The
    * estimate join touches d·topN matrix cells. CMS guarantees
    * est ≥ exact always (increments only collide upward), asserted
    * downstream and in the spec.
    *
    * Engine parity: buckets are pure integer arithmetic on the two
    * md5-derived 60-bit hashes (i·kh2 ≤ 3·2⁶⁰ < 2⁶³ — no overflow for
    * d ≤ 7), so any engine rebuilds the identical matrix. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, d: Int, w: Int,
      topN: Int): DataFrame = {
    require(d >= 1 && d <= 7, s"d=$d outside the overflow-safe KM range 1..7")
    val kh = df.select(col(keyCol),
      hash60(col(keyCol)).as("kh1"), hash60b(col(keyCol)).as("kh2"))
    def bucket(i: Int): Column =
      (col("kh1") + lit(i.toLong) * col("kh2")) % lit(Mod60) % lit(w.toLong)

    val matrix = kh
      .select(posexplode(array((0 until d).map(bucket): _*)).as(Seq("i", "b")))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("c"))

    val exact = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_cnt"))
    val top = exact
      .orderBy(col("exact_cnt").desc, col(keyCol).asc)
      .limit(topN)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("exact_cnt").desc, col(keyCol).asc)))

    // d probe cells for each of the topN keys; matrix side is ≤ d·w
    // rows (broadcast), keys side is topN rows
    val probes = top
      .withColumn("kh1", hash60(col(keyCol)))
      .withColumn("kh2", hash60b(col(keyCol)))
      .select(col(keyCol), col("exact_cnt"), col("rnk"),
        posexplode(array((0 until d).map(bucket): _*)).as(Seq("i", "b")))
    probes
      .join(broadcast(matrix), Seq("i", "b"))
      .groupBy(col(keyCol), col("exact_cnt"), col("rnk"))
      .agg(min(col("c")).as("est_cnt"))
      .withColumn("overestimates", col("est_cnt") >= col("exact_cnt"))
      .select(col(keyCol), col("exact_cnt"), col("est_cnt"),
        col("overestimates"), col("rnk").cast("int").as("rnk"))
  }

  // ------------------------------------------------------- KMV ledger

  /** Per-group KMV sketch as a STORED ledger row: the k smallest
    * 60-bit member hashes, ascending (the [[graft.functions.KmvSketchAgg]]
    * buffer verbatim). 8k bytes per group whatever the member
    * cardinality — the distinct-count state a 100 TB corpus can
    * actually keep per (source, day, …) forever. */
  def kmvLedger(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    df.groupBy(col(groupCol))
      .agg(Bridge.column(graft.functions.KmvSketchAgg(
        Bridge.expression(hash60(col(valueCol))), k)
        .toAggregateExpression()).as("kmv"))
  }

  /** O(new)-per-day KMV ledger maintenance: fold TODAY's batch to its
    * own per-group sketch (map-side partial-merge, ≤ k longs per
    * task·group on the wire), then merge with the stored ledger by
    * pure array arithmetic — the k smallest of the union of two
    * k-smallest sets IS the k-smallest of the united underlying sets
    * (KMV's mergeability theorem; a shared member hashes identically
    * on both sides, so `array_distinct` collapses it and nothing
    * double-counts). History contributes ONLY its ledger row — the
    * historical members are never rescanned — and the merged frame is
    * tomorrow's ledger, self-maintaining like the q140 quality ledger.
    * The merge join is ledger-sized (|groups| rows), never corpus-
    * sized. */
  def kmvLedgerMerge(ledger: DataFrame, batch: DataFrame,
      groupCol: String, valueCol: String, k: Int): DataFrame = {
    val empty = array().cast("array<bigint>")
    val b = kmvLedger(batch, groupCol, valueCol, k)
      .withColumnRenamed("kmv", "kmv_b")
    ledger.join(b, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        slice(array_sort(array_distinct(concat(
            coalesce(col("kmv"), empty), coalesce(col("kmv_b"), empty)))),
          1, k).as("kmv"))
  }

  /** Render a KMV ledger to the q82-shaped report: sketch size, k-th
    * hash, and the (k-1)·2⁶⁰/h_k estimate (exact when the group never
    * filled its sketch). Plain double division of exact integers —
    * engine-identical, so the whole report hash-gates. */
  def kmvLedgerReport(ledger: DataFrame, groupCol: String,
      k: Int): DataFrame =
    ledger
      .select(col(groupCol),
        size(col("kmv")).cast("long").as("n_sketch"),
        try_element_at(col("kmv"), lit(-1)).as("kth_hash"))
      .withColumn("kmv_estimate",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("kth_hash").cast("double")))

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

  /** Cross-source overlap matrix from MERGEABLE KMV sketches — the
    * sketch-algebra scale form of
    * [[Decontam.sourceOverlapMatrix]] (q128): per source, the k
    * smallest md5 hashes of its word `shingleK`-shingles stand in for
    * the whole shingle set, and every pairwise union/intersection/
    * Jaccard estimate is pure arithmetic on those k-member arrays —
    * the classic KMV set algebra (union sketch = k smallest of A ∪ B;
    * ρ = fraction of the union sketch present in BOTH inputs estimates
    * Jaccard; intersection ≈ ρ · union estimate).
    *
    * Scale shape: q128's exact form pays one corpus-wide exchange of
    * DISTINCT (source, shingle) pairs; here the native
    * [[graft.functions.KmvSketchAgg]] partial-combines map-side so
    * ≤ k longs per task·source reach the exchange — corpus shingles
    * never travel at all. The s² pair expansion happens IN-ROW on one
    * collected row of |sources| sketches (mixture components number
    * in the dozens; |S|·k longs is kilobytes), every array op a
    * codegen'd higher-order function over bound attributes. Estimates
    * are deterministic — md5 hashing, integer sketch members, single
    * double divisions — so the oracle reproduces them bit-for-bit,
    * the q82 discipline. */
  def kmvSourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      shingleK: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val agg = Bridge.column(
      graft.functions.KmvSketchAgg(
        Bridge.expression(hash60(col("sh"))), k).toAggregateExpression())
    val perSource = Dedup
      .explodedShingles(docs, srcCol, textCol, shingleK, dedup = false)
      .groupBy(col("doc_id").as("src"))
      .agg(agg.as("kmv"))
    perSource
      .agg(sort_array(collect_list(struct(col("src"), col("kmv"))))
        .as("arr"))
      .select(explode(expr(
        """flatten(transform(arr, (a, i) ->
             transform(slice(arr, i + 2, size(arr)), b ->
               struct(a.src AS src_a, b.src AS src_b,
                      a.kmv AS ka, b.kmv AS kb))))""")).as("p"))
      .select(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"),
        col("p.ka").as("ka"), col("p.kb").as("kb"))
      .withColumn("u",
        expr(s"slice(array_sort(array_distinct(concat(ka, kb))), 1, $k)"))
      .withColumn("n_union_sketch", size(col("u")).cast("long"))
      .withColumn("rho_num",
        expr("size(filter(u, x -> array_contains(ka, x) AND array_contains(kb, x)))")
          .cast("long"))
      .withColumn("jaccard_est",
        col("rho_num").cast("double") / col("n_union_sketch").cast("double"))
      .withColumn("union_est",
        when(col("n_union_sketch") < k, col("n_union_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            try_element_at(col("u"), lit(-1)).cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
      .select(col("src_a"), col("src_b"), col("n_union_sketch"),
        col("rho_num"), col("jaccard_est"), col("union_est"),
        col("inter_est"))
      .orderBy(col("src_a"), col("src_b"))
  }
}
