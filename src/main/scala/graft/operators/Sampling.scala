package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset assembly operators a training-data pipeline runs after
  * curation (SURVEY §7.5 extension family): deterministic splits and
  * context-window packing. Everything is a pure column expression —
  * no sampling RNG, no driver state — so results are identical across
  * engines, re-runs, and partitionings (the property that makes a
  * 100 TB split auditable: membership is a function of the KEY, not of
  * execution order).
  */
object Sampling {

  /** Deterministic split bucket in [0, 100) from the md5 of the id —
    * stable under re-partitioning, appends, and engine choice (the
    * standard alternative to `randomSplit`, whose assignment depends on
    * partition layout and seed plumbing). */
  def splitBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(100L))

  /** Split label as a pure column expression over the id — the form
    * that composes with NO join: anywhere a plan already has the id,
    * its split is three expressions away. [0, valPct) → val,
    * [valPct, valPct+testPct) → test, rest → train. */
  def splitOf(id: Column, valPct: Int, testPct: Int): Column = {
    val b = splitBucket(id)
    when(b < valPct, "val")
      .when(b < valPct + testPct, "test")
      .otherwise("train")
  }

  /** Label rows train/val/test by hash bucket: [0, valPct) → val,
    * [valPct, valPct+testPct) → test, rest → train. */
  def withSplit(df: DataFrame, idCol: String, valPct: Int,
      testPct: Int): DataFrame =
    df.withColumn("split", splitOf(col(idCol), valPct, testPct))

  /** Deterministic stratified sample: the `perStratum` hash-smallest
    * rows of each stratum — an unbiased fixed-size per-group subset
    * (md5 order is independent of any data column) that is REPRODUCIBLE
    * across runs and engines, unlike `sampleBy`'s RNG draw. The window
    * top-k plan prunes with WindowGroupLimit, so each stratum streams —
    * the eval-set construction shape for a 100 TB corpus. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      perStratum: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashOrder(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perStratum)
      .drop("__rk")
  }

  /** 60-bit md5 prefix as the hash sort key; the caller's id tie-break
    * makes the order total even on the (astronomically rare) collision. */
  private def hashOrder(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic weighted sample WITHOUT replacement — the
    * Efraimidis–Spirakis A-ES selection: each row draws a uniform
    * u ∈ (0, 1] and the `n` rows with the largest u^(1/w) win, which
    * makes every row's inclusion probability proportional to its
    * weight (quality-weighted subset selection, the "sample the good
    * documents harder" step between scoring and training). Ranking on
    * ln(u)/w is the same order without the overflow-prone power.
    *
    * The "draw" is the md5-derived 60-bit uniform of the ID
    * ([[hashOrder]] + 1, over 2⁶⁰) — no RNG, no seed plumbing: the
    * sample is a pure function of (id, weight), reproducible across
    * runs, engines, and partitionings, and auditable row-by-row (the
    * [[splitBucket]] discipline applied to weighted draws). Rows with
    * weight ≤ 0 are ineligible and excluded, exactly as a zero weight
    * means zero inclusion probability in A-ES.
    *
    * Scale shape: the key is a map-side expression and the top-n is a
    * global `orderBy().limit(n)` — Spark plans TakeOrderedAndProject
    * (per-partition bounded heaps, then one ≤ n-row merge), no
    * corpus-wide sort, no window over the corpus; the final rank
    * window runs post-limit over ≤ n rows (the q92-family pattern the
    * plan lint recognizes as bounded). Output: (rnk, id, weight).
    *
    * The emitted columns are all integers — the double selection key
    * is dropped, so the oracle hash can never trip over the VALUE of a
    * last-ulp `ln` difference between engines. Ordering carries a
    * probabilistic caveat, not a guarantee: the compared keys are
    * ln(u)/w for differing weights, and two such keys can land
    * arbitrarily close, so a pair straddling the top-n cut within
    * ~1 ulp could in principle rank differently under Spark's
    * `Math.log` vs DuckDB's `ln` (each only faithfully rounded).
    * Exact key TIES break deterministically by id; the near-tie window
    * is ~2⁻⁵² of key space per boundary pair — negligible and
    * gate-verified at the tested SFs, but a caveat a portability
    * auditor should know about. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    // (h+1)/2^60 ∈ (0, 1]: both the long→double conversions and the
    // division are single IEEE operations, identical in any engine
    val u = (hashOrder(col(idCol)) + lit(1L)).cast("double") /
      lit(1152921504606846976L).cast("double")
    val key = log(u) / col(weightCol).cast("double")
    val ranked = df
      .filter(col(weightCol) > 0)
      .withColumn("__k", key)
      .orderBy(col("__k").desc, col(idCol).asc)
      .limit(n)
    ranked
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__k").desc, col(idCol).asc)))
      .select(col("rnk"), col(idCol),
        col(weightCol).cast("long").as("weight"))
  }

  /** Hash ranges for the distributed running sums: the top 10 bits of
    * the 60-bit hash key — a MAP-SIDE expression (no sampling pass, no
    * extra exchange) that is monotone in the hash, so sorting by
    * (range, hash, id) IS sorting by (hash, id) and the global running
    * sum is unchanged row-for-row. 1024 ranges exceed any realistic
    * shuffle-partition count (parallelism ceiling = |ranges|) while the
    * subtotal frame stays a trivially-broadcast ≤ 1024 rows; the md5 is
    * uniform, so ranges are balanced at any corpus size. */
  private val RangeShift = 50 // 60-bit hash >> 50 → range in [0, 1024)
  private val NumRanges = 1024

  /** Cumulative per-range offsets from the (range, subtotal) frame:
    * subtotals collect into ONE sorted array row (bounded: ≤ |ranges|
    * entries) and a single `aggregate` fold emits each range paired
    * with the sum of all EARLIER ranges' tokens, exploded back to
    * |ranges| rows. No window (a running sum over the subtotal frame
    * would be the single-partition WindowExec this family just
    * eliminated), no per-corpus-row lambda — and `__off` surfaces as
    * an opaque generator attribute, which keeps constraint inference
    * from substituting the fold into main-side join filters (observed
    * with a scalar-subquery formulation: the O(|ranges|) fold leaked
    * into a per-row `isnotnull` filter on the corpus scan). */
  private def rangeOffsets(sub: DataFrame): DataFrame =
    sub.agg(sort_array(collect_list(struct(
        col("__r").as("r"), col("__sub").as("s")))).as("e"))
      .select(explode(expr(
        """aggregate(e,
             named_struct('acc', CAST(0 AS BIGINT),
                          'out', CAST(array() AS ARRAY<STRUCT<r: BIGINT, off: BIGINT>>)),
             (st, x) -> named_struct(
               'acc', st.acc + x.s,
               'out', array_append(st.out, named_struct('r', x.r, 'off', st.acc))),
             st -> st.out)""")).as("kv"))
      .select(col("kv.r").as("__r"), col("kv.off").as("__off"))

  /** Distributed running sum of `tokensCol` over the global order
    * (`__range` ASC, then `orderCols` within each range) — the classic
    * two-pass prefix sum, replacing the single-partition global window
    * that was the engine's last scale-killer (round-7 verdict #1):
    *
    *  1. within-range running sums via a window PARTITIONED by
    *     `__range` — the only corpus-wide exchange, and it spreads
    *     across executors like any grouped window;
    *  2. per-range token subtotals (a map-side-combining aggregate —
    *     the exchange carries ≤ |ranges| rows per partition) expand to
    *     the cumulative-offset frame via [[rangeOffsets]];
    *  3. offsets fan back onto the corpus as a broadcast HASH join on
    *     `__range` (O(1) per row; null-safe, so a null range key —
    *     null id/order values — flows through like the global window's
    *     nulls-first rather than dropping at the join) and
    *     `__cum` = local + offset.
    *
    * Same numbers as the global window — the per-range offset is
    * exactly the sum of all earlier ranges' tokens — so the DuckDB
    * oracles (which keep the readable single-window SQL) are unchanged.
    * Input must carry `__range`; returns (input + `__cum`, the
    * per-range subtotal frame for callers that also need the corpus
    * total without another pass). */
  private def rangedCumSum(withRange0: DataFrame, orderCols: Seq[Column],
      tokensCol: String): (DataFrame, DataFrame) = {
    // the input feeds BOTH passes of the distributed prefix sum (the
    // per-range subtotal aggregate and the ranked main pass) — without
    // a barrier the caller's whole upstream chain evaluates twice, and
    // a pushed-down consumer filter clones it a third time (r18: q226's
    // plan carried six copies of the quality+split chain through the
    // budget → split → manifest composition). Scoped persist: the
    // chain runs once, both passes read the cache.
    val withRange = graft.util.CacheScope.persist(withRange0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__range"))
      .orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val sub = withRange.groupBy(col("__range").as("__r"))
      .agg(sum(col(tokensCol)).cast("long").as("__sub"))
    val out = withRange
      .withColumn("__local", sum(col(tokensCol)).over(w).cast("long"))
      .join(broadcast(rangeOffsets(sub)), col("__range") <=> col("__r"))
      .withColumn("__cum", col("__local") + col("__off"))
      .drop("__r", "__off", "__local")
    (out, sub)
  }

  /** Token-budget subset: take documents in deterministic hash order
    * until the running token total reaches `budgetTokens` — the "give
    * me a reproducible N-token dataset" selection. Hash order makes the
    * subset unbiased AND stable across runs/engines; the budget check
    * is `cum - tokens < budget`, so the document that CROSSES the
    * budget line is included (the subset always reaches the budget
    * when enough data exists). The running sum is the [[rangedCumSum]]
    * distributed prefix sum — no single-partition window, identical
    * values to the global-window form. */
  def tokenBudgetSubset(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long): DataFrame = {
    val withRange = df
      .withColumn("__h", hashOrder(col(idCol)))
      // null id → null hash → range -1: nulls-first, like the window
      .withColumn("__range",
        coalesce(shiftright(col("__h"), RangeShift), lit(-1L)))
    val (cum, _) = rangedCumSum(withRange,
      Seq(col("__h").asc, col(idCol).asc), tokensCol)
    cum.filter(col("__cum") - col(tokensCol) < budgetTokens)
      .drop("__cum", "__h", "__range")
  }

  /** Equi-depth quantile buckets over an integral score — curriculum
    * bins / score calibration: every row gets
    * bucket = ((rank − 1) · k) DIV n for its global rank under
    * (score ASC, id ASC), so buckets hold equal COUNTS (±1) however
    * skewed the score distribution — the decile cut a length-ordered
    * curriculum or a quality-calibration step consumes. Integer-exact
    * and engine-portable (rank and count arithmetic only, no
    * percentile interpolation).
    *
    * Scale shape: the global rank is the [[rangedCumSum]] distributed
    * prefix sum with the SCORE ITSELF as the range key — monotone in
    * the (score, id) order by construction, so no sampling pass and no
    * corpus-wide sort; the rank window partitions by score value and
    * the per-score subtotal frame is |distinct scores| rows. The score
    * must be integral and non-null, and its distinct-value count is
    * the parallelism ceiling — for token lengths, quality grades, or
    * any discretized score that is thousands of values; a continuous
    * double score should be discretized first (which a calibration
    * step does anyway). Corpus total attaches as a scalar subquery
    * from the same subtotal frame (no second scan). */
  def equiDepthBuckets(df: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(k >= 1, s"k=$k must be >= 1")
    val t = df.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"equiDepthBuckets needs an integral score, got $t for $scoreCol")
    val withRange = df.withColumn("__one", lit(1L))
      .withColumn("__range", col(scoreCol).cast("long"))
    // running COUNT = running sum of ones; rank ≡ __cum
    val (cum, sub) = rangedCumSum(withRange, Seq(col(idCol).asc), "__one")
    val total = sub.agg(coalesce(sum(col("__sub")), lit(0L)).as("__total"))
    cum
      .withColumn("__total",
        Bridge.column(ScalarSubquery(Bridge.analyzed(total))))
      .withColumn("bucket",
        expr(s"((__cum - 1L) * $k) DIV greatest(__total, 1L)").cast("long"))
      .drop("__cum", "__range", "__total", "__one")
  }

  /** [[equiDepthBuckets]] over a FLOAT score — model quality scores,
    * perplexities, calibrated probabilities — via the documented
    * fixed-point micro-unit discipline (the q136 `qualityMicro` rule):
    * the score quantizes to `floor(score · 10^6)` as BIGINT and the
    * integral form runs on that. `floor` (not `round`) so both engines
    * agree bit-for-bit on every value including negatives — floor is
    * toward −∞ everywhere, while half-up rounding modes differ across
    * engines — and the quantized product of an IEEE-754 double
    * multiply is itself deterministic. Ties within 10⁻⁶ collapse to
    * one quantum and fall back to the id tie-break — exactly the
    * granularity a curriculum or calibration consumer means by "equal
    * score". The score must be non-null and finite (NaN/±Inf have no
    * integral image; a calibration step bounds its scores anyway) and
    * |score| must stay under ~9.2 · 10^12 so the micro image fits
    * BIGINT. Same scale shape as the integral form: distributed
    * prefix sum ranged on the quantized score, no corpus-wide sort. */
  def equiDepthBucketsMicro(df: DataFrame, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val t = df.schema(scoreCol).dataType
    require(Seq(DoubleType, FloatType).contains(t),
      s"equiDepthBucketsMicro needs a float score, got $t for $scoreCol" +
        " (integral scores take equiDepthBuckets directly)")
    equiDepthBuckets(
      df.withColumn("__micro",
        floor(col(scoreCol).cast("double") * lit(1000000.0d)).cast("long")),
      idCol, "__micro", k)
      .drop("__micro")
  }

  /** Token-balanced shard assignment — the export step for distributed
    * training: every document lands in exactly one of `nShards` shards
    * with near-equal token mass (each worker then reads one shard).
    * Documents take the deterministic md5 hash order (unbiased and
    * engine-portable, the [[tokenBudgetSubset]] discipline) and a doc
    * goes to the shard its LAST token falls in when the running token
    * stream is cut into n equal spans: shard = ((cum_end − 1) · n) DIV
    * total, integer-exact, so imbalance is bounded by the largest
    * single document. Running sum via [[rangedCumSum]]; the corpus
    * total rides the same per-range subtotals (one bounded aggregate,
    * not a second corpus scan) and attaches as a scalar subquery —
    * no 1-row cross join in the plan. */
  def tokenBalancedShards(df: DataFrame, idCol: String, tokensCol: String,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val withRange = df
      .withColumn("__h", hashOrder(col(idCol)))
      .withColumn("__range",
        coalesce(shiftright(col("__h"), RangeShift), lit(-1L)))
    val (cum, sub) = rangedCumSum(withRange,
      Seq(col("__h").asc, col(idCol).asc), tokensCol)
    val total = sub.agg(coalesce(sum(col("__sub")), lit(0L)).as("__total"))
    cum
      .withColumn("__total",
        Bridge.column(ScalarSubquery(Bridge.analyzed(total))))
      .withColumn("shard",
        expr(s"((greatest(__cum, 1L) - 1L) * $nShards) DIV greatest(__total, 1L)")
          .cast("long"))
      .drop("__cum", "__h", "__range", "__total")
  }

  /** The export step over [[tokenBalancedShards]]: write the corpus as
    * one parquet directory PER SHARD (`shard=K/`), so each training
    * worker reads exactly its shard by path — the artifact a
    * distributed loader actually consumes, closing the loop from
    * assignment to disk. Writer tasks are range-partitioned on
    * (shard, id): each shard's rows land in a contiguous task band
    * (≈ `writeTasks`/nShards tasks per shard, so shard write
    * parallelism scales with the cluster, not one task per shard) and
    * each task feeds at most two shard directories — file count stays
    * O(writeTasks), never the tasks × partitions small-file explosion.
    * `maxRecordsPerFile` bounds individual files for loader-side
    * streaming. */
  def writeShards(df: DataFrame, idCol: String, tokensCol: String,
      nShards: Int, path: String, writeTasks: Int = 0,
      maxRecordsPerFile: Long = 1L << 20): Unit = {
    val n = if (writeTasks > 0) writeTasks
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    tokenBalancedShards(df, idCol, tokensCol, nShards)
      .repartitionByRange(n, col("shard"), col(idCol))
      .write
      .partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }

  /** Integrity manifest over [[tokenBalancedShards]] — the artifact a
    * training job checks BEFORE burning cluster-hours on a corrupted
    * or stale export: per shard, the doc count, the token mass, and an
    * order-independent CONTENT checksum (bit-XOR of each document's
    * 60-bit normalized-text fingerprint). XOR is commutative/
    * associative, so the checksum is identical however the shard's
    * rows are partitioned or ordered — re-deriving the manifest from
    * the files on the training side and comparing catches a dropped
    * file, a duplicated part, or an edited document, none of which
    * row counts alone can (count survives an edit; token mass
    * survives a swap).
    *
    * Scale shape: fingerprints compute map-side from the text, which
    * is then pruned — the shard exchange carries (shard, tokens,
    * fp60) only; all three aggregates partial-combine; output is
    * exactly `nShards` rows. */
  def shardManifest(df: DataFrame, idCol: String, tokensCol: String,
      textCol: String, nShards: Int): DataFrame =
    tokenBalancedShards(df, idCol, tokensCol, nShards)
      .withColumn("__fp60",
        conv(substring(Dedup.fingerprint(col(textCol)), 1, 15), 16, 10)
          .cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("sum_tokens"),
        expr("bit_xor(__fp60)").as("checksum"))
      .orderBy(col("shard"))

  /** Length-bucketed micro-batch assignment — padding-efficiency
    * batching for tokenized training/inference: documents band by token
    * length (integer DIV into `bandTokens`-wide bins), then each band
    * forms fixed-`batchSize` batches in (n_tokens, id) order. A batch
    * pads every member to its own max, so banding bounds per-row waste
    * by bandTokens-1 — versus corpus-random batching where one long
    * outlier pads the whole batch to itself.
    *
    * Scale shape: the banding is a map-side expression and the only
    * window partitions BY BAND — no corpus-wide sort; bands distribute
    * across executors like any grouped window. Output: input columns +
    * (band, batch_idx). */
  def lengthBucketedBatches(df: DataFrame, idCol: String, tokensCol: String,
      bandTokens: Int, batchSize: Int): DataFrame = {
    require(bandTokens >= 1 && batchSize >= 1,
      s"bandTokens=$bandTokens, batchSize=$batchSize must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"))
      .orderBy(col(tokensCol).asc, col(idCol).asc)
    df.withColumn("band", expr(s"$tokensCol DIV $bandTokens").cast("long"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"(__rn - 1) DIV $batchSize").cast("long"))
      .drop("__rn")
  }

  /** Per-batch padding account over [[lengthBucketedBatches]] output:
    * each batch pads to its max member, so padded = n_docs · max and
    * waste = padded − Σ tokens. The final (usually short) batch of each
    * band surfaces here with its n_docs < batchSize. */
  def batchPaddingStats(batches: DataFrame, tokensCol: String): DataFrame =
    batches.groupBy(col("band"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        max(col(tokensCol)).cast("long").as("max_tokens"),
        sum(col(tokensCol)).cast("long").as("sum_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("max_tokens"))
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))

  /** Context-window packing, concatenation-order form: documents are
    * laid end-to-end in `orderCol` order and the token stream is cut at
    * fixed `contextLen` boundaries — exactly how pretraining data is
    * chunked into training sequences. Emits per document its token span
    * [tok_start, tok_end) in the stream and the first/last chunk it
    * lands in (a document may straddle chunks; chunk_last - chunk_first
    * is its straddle count).
    *
    * `orderCol` is an arbitrary user order, so ranges can't come from a
    * map-side hash prefix the way [[tokenBudgetSubset]]'s do. For a
    * NUMERIC `orderCol` the range is `width_bucket` over the column's
    * [min, max+1) span (bounds ride in as one tiny scalar subquery) —
    * still a map-side, codegen'd expression, monotone non-strict in the
    * key (long→double rounding and bucketing both preserve ≤), equal
    * keys always share a bucket, so (range, key) order IS key order and
    * the running sum is unchanged. NaN keys pin to a range after every
    * bucket and nulls to one before (matching the window's null/NaN
    * ordering); value-skewed keys imbalance ranges — performance, never
    * correctness. Non-numeric keys (strings, dates) take the general
    * fallback: RANGE-partition on `orderCol` with the materialized
    * partition id as the range key, CacheScope-persisted because
    * `spark_partition_id` is nondeterministic — ReuseExchange will not
    * unify the window and subtotal branches, and an unpersisted plan
    * would re-shuffle the corpus once per branch (pass the projection
    * you want packed, not full documents, and the materialized frame
    * stays narrow). Either way: ONE corpus-wide window exchange plus
    * bounded/slim side passes; no single-partition anything. */
  def packContexts(df: DataFrame, orderCol: String, tokensCol: String,
      contextLen: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val oc = col(orderCol)
    val numeric = df.schema(orderCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val withRange = if (numeric) {
      val v = oc.cast("double")
      val bounds = df.agg(struct(min(v).as("lo"), max(v).as("hi")).as("mm"))
      df.withColumn("__mm",
          Bridge.column(ScalarSubquery(Bridge.analyzed(bounds))))
        .withColumn("__range", coalesce(
          when(isnan(v), lit(NumRanges + 2L)), // NaN sorts after everything
          expr(s"width_bucket(CAST(`$orderCol` AS DOUBLE), __mm.lo, " +
            s"__mm.hi + 1d, $NumRanges)"),
          lit(-1L)))                           // null keys sort first
        .drop("__mm")
    } else {
      // spark_partition_id is nondeterministic, so this frame MUST
      // materialize before fanning into the two prefix-sum passes —
      // rangedCumSum's input barrier (r18) is that materialization
      df.repartitionByRange(NumRanges, oc.asc)
        .withColumn("__range", spark_partition_id().cast("long"))
    }
    val (cum, _) = rangedCumSum(withRange, Seq(oc.asc), tokensCol)
    // integer DIV, not floor(double /): token offsets are exact longs
    cum.withColumn("tok_end", col("__cum"))
      .withColumn("tok_start", (col("tok_end") - col(tokensCol)).cast("long"))
      .withColumn("chunk_first", expr(s"tok_start DIV $contextLen"))
      .withColumn("chunk_last",
        when(col(tokensCol) === 0, expr(s"tok_start DIV $contextLen"))
          .otherwise(expr(s"(tok_end - 1) DIV $contextLen")))
      .drop("__cum", "__range")
  }

  /** Split-leakage audit: does identical text appear on both sides of a
    * [[withSplit]] boundary? The hash split is a function of the ID, so
    * two COPIES of a document (different ids, same text) land in
    * independent splits — every duplicate group is a potential
    * val/test-set leak, the train-on-test contamination an eval must
    * rule out. One summary row: duplicate fingerprint groups, groups
    * spanning >1 split, and the per-pair breakdown (train∩val,
    * train∩test, val∩test), all integer-exact.
    *
    * Scale shape: the corpus shuffles ONCE, keyed by the 16-byte text
    * fingerprint (never the text); per-group split presence folds to
    * three bits map-side; the final reduce is the 1-row global
    * aggregate (partial-combined, the q100-class constant output).
    * O(corpus) with no window, no join, no second scan. */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      valPct: Int, testPct: Int): DataFrame = {
    val perFp = withSplit(docs.select(col(idCol), col(textCol)),
        idCol, valPct, testPct)
      .select(Dedup.fingerprint(col(textCol)).as("fp"), col("split"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        max(when(col("split") === "train", 1).otherwise(0)).as("has_train"),
        max(when(col("split") === "val", 1).otherwise(0)).as("has_val"),
        max(when(col("split") === "test", 1).otherwise(0)).as("has_test"))
    perFp.agg(
      sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_fps"),
      sum(when(col("has_train") + col("has_val") + col("has_test") > 1,
        1L).otherwise(0L)).as("n_leaky_fps"),
      sum(when(col("has_train") === 1 && col("has_val") === 1, 1L)
        .otherwise(0L)).as("n_train_val"),
      sum(when(col("has_train") === 1 && col("has_test") === 1, 1L)
        .otherwise(0L)).as("n_train_test"),
      sum(when(col("has_val") === 1 && col("has_test") === 1, 1L)
        .otherwise(0L)).as("n_val_test"))
  }

  /** Near-duplicate split leakage — the paraphrase-level sibling of
    * [[splitLeakage]]: exact-fingerprint auditing misses the
    * boilerplate-tweaked copy of a test document sitting in train, which
    * is precisely the contamination that inflates evals. Verified
    * near-dup pairs ([[Dedup.proposeVerify]]: LSH proposes, exact
    * shingle-Jaccard ≥ `minJaccard` verifies) are classified by the
    * splits of their two sides. One summary row: total verified pairs,
    * same-split pairs, cross-split pairs, and the per-boundary
    * breakdown.
    *
    * Scale shape: everything downstream of the (already Σbucket²-
    * bounded, candidate-restricted) verify stage is per-PAIR arithmetic
    * — the split of each side is a pure expression over the id
    * ([[splitOf]]), so classification adds ZERO joins and zero
    * exchanges beyond the q19 pipeline it composes; the tail is the
    * 1-row global reduce. The jaccard threshold compares the q19-gated
    * round(·,6) value, identical in both engines by construction. */
  def nearDupLeakage(docs: DataFrame, idCol: String, textCol: String,
      valPct: Int, testPct: Int, minJaccard: Double = 0.5,
      shingleK: Int = 3, numHashes: Int = 6,
      rowsPerBand: Int = 2): DataFrame = {
    val sa = splitOf(col("doc_a"), valPct, testPct)
    val sb = splitOf(col("doc_b"), valPct, testPct)
    Dedup.proposeVerify(docs, idCol, textCol, shingleK, numHashes,
        rowsPerBand)
      .filter(col("jaccard") >= minJaccard)
      .select(sa.as("sa"), sb.as("sb"))
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("sa") === col("sb"), 1L).otherwise(0L)),
          lit(0L)).as("n_within"),
        coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
          lit(0L)).as("n_cross"),
        coalesce(sum(when(
          array_contains(array(col("sa"), col("sb")), "train") &&
          array_contains(array(col("sa"), col("sb")), "val"), 1L)
          .otherwise(0L)), lit(0L)).as("n_train_val"),
        coalesce(sum(when(
          array_contains(array(col("sa"), col("sb")), "train") &&
          array_contains(array(col("sa"), col("sb")), "test"), 1L)
          .otherwise(0L)), lit(0L)).as("n_train_test"),
        coalesce(sum(when(
          array_contains(array(col("sa"), col("sb")), "val") &&
          array_contains(array(col("sa"), col("sb")), "test"), 1L)
          .otherwise(0L)), lit(0L)).as("n_val_test"))
  }

  /** Split-leakage REPAIR — the fix for what [[splitLeakage]] audits:
    * every document whose text fingerprint group spans more than one
    * split is reassigned to the split of the group's LEADER (smallest
    * doc_id), so a duplicated text can never sit on both sides of a
    * train/eval boundary again. Returns the move ledger —
    * (doc_id, old_split, new_split) for exactly the documents that
    * change — which composes with [[withSplit]] downstream (left-join
    * the ledger, coalesce new over old) and doubles as the audit
    * artifact of what the repair touched.
    *
    * Leader-split (not majority, not eval-priority) is the contract:
    * it is deterministic under appends of new duplicates with higher
    * ids, and it keeps the repair a pure function of the group — the
    * same discipline as [[splitOf]] itself.
    *
    * Scale shape: the corpus shuffles ONCE, keyed by the 16-byte
    * fingerprint (text never travels — the q126 rule), and the
    * per-group leader + mixed-split test fold map-side to a struct-min
    * and two split bounds. Groups that are single-doc or single-split
    * drop BEFORE the join back, so the leaky-leader frame is only the
    * actually-leaky groups — tiny on any real corpus (leak rates are
    * per-mille) and broadcast back onto a second corpus scan: the
    * repair adds zero corpus-sized exchanges. (A pathological corpus
    * where most groups leak would want the hint dropped — the join
    * key is still the fingerprint, so a shuffle join degrades
    * gracefully.) */
  def repairSplitLeakage(docs: DataFrame, idCol: String, textCol: String,
      valPct: Int, testPct: Int): DataFrame = {
    val tagged = docs.select(col(idCol).as("doc_id"),
      Dedup.fingerprint(col(textCol)).as("fp"),
      splitOf(col(idCol), valPct, testPct).as("split"))
    val leaky = tagged
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("split"))).as("__ldr"),
        count(lit(1)).as("__n"),
        min(col("split")).as("__smin"), max(col("split")).as("__smax"))
      .filter(col("__n") > 1 && col("__smin") =!= col("__smax"))
      .select(col("fp"), col("__ldr.split").as("new_split"))
    tagged.join(broadcast(leaky), Seq("fp"))
      .filter(col("split") =!= col("new_split"))
      .select(col("doc_id"), col("split").as("old_split"),
        col("new_split"))
  }
}
