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

  /** Label rows train/val/test by hash bucket: [0, valPct) → val,
    * [valPct, valPct+testPct) → test, rest → train. */
  def withSplit(df: DataFrame, idCol: String, valPct: Int,
      testPct: Int): DataFrame = {
    val b = splitBucket(col(idCol))
    df.withColumn("split",
      when(b < valPct, "val")
        .when(b < valPct + testPct, "test")
        .otherwise("train"))
  }

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

  /** Token-budget subset: take documents in deterministic hash order
    * until the running token total reaches `budgetTokens` — the "give
    * me a reproducible N-token dataset" selection. Hash order makes the
    * subset unbiased AND stable across runs/engines; the budget check
    * is `cum - tokens < budget`, so the document that CROSSES the
    * budget line is included (the subset always reaches the budget
    * when enough data exists). One window pass; at corpus scale
    * partition the window by shard and give each shard its budget
    * share. */
  def tokenBudgetSubset(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(hashOrder(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w).cast("long"))
      .filter(col("__cum") - col(tokensCol) < budgetTokens)
      .drop("__cum")
  }

  /** Token-balanced shard assignment — the export step for distributed
    * training: every document lands in exactly one of `nShards` shards
    * with near-equal token mass (each worker then reads one shard).
    * Documents take the deterministic md5 hash order (unbiased and
    * engine-portable, the [[tokenBudgetSubset]] discipline) and a doc
    * goes to the shard its LAST token falls in when the running token
    * stream is cut into n equal spans: shard = ((cum_end − 1) · n) DIV
    * total, integer-exact, so imbalance is bounded by the largest
    * single document. One window pass; at corpus scale partition the
    * window by a hash prefix and shard within partitions. */
  def tokenBalancedShards(df: DataFrame, idCol: String, tokensCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(hashOrder(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val total = df.agg(sum(col(tokensCol)).cast("long").as("__total"))
    df.withColumn("__cum", sum(col(tokensCol)).over(w).cast("long"))
      .crossJoin(broadcast(total)) // 1-row corpus-constant fan
      .withColumn("shard",
        expr(s"((greatest(__cum, 1L) - 1L) * $nShards) DIV greatest(__total, 1L)")
          .cast("long"))
      .drop("__cum", "__total")
  }

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
    * is its straddle count). One window pass — the running sum streams
    * per partition; at corpus scale partition by shard and pack within
    * shards. */
  def packContexts(df: DataFrame, orderCol: String, tokensCol: String,
      contextLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(orderCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // integer DIV, not floor(double /): token offsets are exact longs
    df.withColumn("tok_end", sum(col(tokensCol)).over(w).cast("long"))
      .withColumn("tok_start", (col("tok_end") - col(tokensCol)).cast("long"))
      .withColumn("chunk_first", expr(s"tok_start DIV $contextLen"))
      .withColumn("chunk_last",
        when(col(tokensCol) === 0, expr(s"tok_start DIV $contextLen"))
          .otherwise(expr(s"(tok_end - 1) DIV $contextLen")))
  }
}
