package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus datasheet: the one-row summary a dataset release ships
  * (document/source counts, token totals, exact-dup mass, length
  * stats) — and its O(new) DAILY form, which updates stored stats from
  * a new batch without rescanning history.
  *
  * Scale design, batch form: one corpus scan, every aggregate
  * partial-combines; the exact COUNT(DISTINCT)s ride Spark's Expand
  * rewrite (×3 small-tuple traffic — the price of exact dup mass in
  * one pass; the two-pass alternative is the q16 dedup ledger joined
  * back). Incremental form: the only history-sized input is the
  * fingerprint LEDGER, and it never crosses an exchange — novelty is
  * decided by the q116 bloom-gated exact core ([[Dedup]]'s
  * `bloomKnownFlag`); everything else merges 1-row frames (sums add,
  * maxes max, sources union over a tiny table). The EXACT median is
  * the one field that does not merge — the incremental row instead
  * carries [[histMedianLo]] over a maintained token-length HISTOGRAM
  * census ([[tokenHistogram]]): per-bin counts merge exactly
  * (elementwise add — unlike an approx_percentile sketch, whose
  * binary state Spark SQL cannot merge across stored rows), the
  * extracted median-bin edge is pure integer arithmetic (portable to
  * the DuckDB oracle bit-for-bit), and the value is within one bin
  * width of the lower-median order statistic by construction
  * (PipelineOpsSpec pins it).
  */
object Datasheet {

  /** Token-length histogram census: (bin, cnt) with
    * bin = min(tokens div binWidth, numBins) — the last bin absorbs
    * overflow. ≤ numBins+1 rows whatever the corpus size: this is the
    * mergeable quantile STATE a stored datasheet keeps (day N+1 =
    * union + per-bin sum, exact), sized so numBins·binWidth covers the
    * realistic document-length range and the overflow tail stays
    * small. */
  def tokenHistogram(docs: DataFrame, textCol: String,
      binWidth: Long = 16L, numBins: Int = 256): DataFrame =
    docs.select(TextAnalysis.tokenCount(col(textCol)).as("tok"))
      .select(least(expr(s"tok DIV ${binWidth}L"),
        lit(numBins.toLong)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))

  /** Median-bin lower edge from a histogram census: the smallest bin
    * whose cumulative count reaches rank (n+1) div 2, times binWidth.
    * The LOWER-MEDIAN order statistic (that rank's value) lies in
    * [value, value + binWidth) for non-overflow bins — the one-bin
    * error bound; the interpolated quantile_cont p50 can exceed it
    * only when the two middle order stats straddle a bin boundary.
    * No window and no join:
    * the ≤ numBins+1 census rows collect into ONE sorted array row and
    * a single `aggregate` fold walks it (the rangeOffsets discipline —
    * a running sum over a bounded census must not cost a
    * single-partition WindowExec). Integer arithmetic only, so the
    * DuckDB oracle reproduces the value exactly. Empty census → null. */
  def histMedianLo(census: DataFrame, binWidth: Long = 16L): DataFrame =
    census
      .agg(
        sort_array(collect_list(struct(col("bin").as("b"),
          col("cnt").as("c")))).as("h"),
        sum(col("cnt")).as("n"))
      .select((expr("""
          aggregate(h,
            named_struct('cum', CAST(0 AS BIGINT),
                         'found', CAST(NULL AS BIGINT)),
            (st, x) -> IF(st.found IS NOT NULL, st,
              named_struct('cum', st.cum + x.c,
                'found', IF(st.cum + x.c >= (n + 1L) DIV 2L, x.b,
                  CAST(NULL AS BIGINT)))),
            st -> st.found)""") * lit(binWidth))
        .as("p50_tokens_hist_lo"))

  private def base(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame =
    docs.select(
      col(srcCol).as("__src"),
      TextAnalysis.tokenCount(col(textCol)).as("tok"),
      TextAnalysis.bpeTokenCount(col(textCol)).as("btok"),
      Dedup.fingerprint(col(textCol)).as("fp"),
      (length(trim(col(textCol))) === 0).as("empty"))

  /** The one-row release summary (q131's shape). */
  def summary(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame =
    base(docs, srcCol, textCol).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("__src")).as("n_sources"),
      sum(col("tok")).as("n_tokens"),
      sum(col("btok")).as("n_bpe_tokens"),
      countDistinct(col("fp")).as("n_unique_fps"),
      (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"),
      sum(when(col("empty"), 1L).otherwise(0L)).as("n_empty_docs"),
      max(col("tok")).as("max_tokens"),
      expr("percentile(tok, 0.5D)").as("p50_tokens"))

  /** O(new) daily update: `prior` is yesterday's [[summary]] row,
    * `priorSources` the stored source census (tiny), `priorHist` the
    * stored token-length histogram census ([[tokenHistogram]] shape,
    * ≤ numBins+1 rows), `ledger` the stored fingerprint table (the
    * ONLY history-sized input — bloom folds it to one sketch per
    * partition, it never crosses an exchange), `batch` the day's
    * documents. Returns the updated summary row with the exact
    * `p50_tokens` replaced by `p50_tokens_hist_lo` — the
    * [[histMedianLo]] of the MERGED census (stored ∪ batch, per-bin
    * sum: an exact merge, so the value is identical to computing the
    * histogram median over history ∪ batch from scratch — the q144
    * contract — and within one binWidth of the lower median). The
    * 1-row merge fans are the audited constant-broadcast class. */
  def incremental(prior: DataFrame, priorSources: DataFrame,
      priorHist: DataFrame, ledger: DataFrame, batch: DataFrame,
      srcCol: String, textCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01, binWidth: Long = 16L,
      numBins: Int = 256): DataFrame = {
    val b = base(batch, srcCol, textCol)
    val bAgg = b.agg(
      count(lit(1)).as("b_docs"),
      sum(col("tok")).as("b_tokens"),
      sum(col("btok")).as("b_btokens"),
      sum(when(col("empty"), 1L).otherwise(0L)).as("b_empty"),
      max(col("tok")).as("b_max"))
    val novelAgg = Dedup.bloomKnownFlag(
        b.select(col("fp")).distinct(), "fp", ledger, "fp",
        expectedItems, fpp)
      .filter(!col("__known_flag"))
      .agg(count(lit(1)).as("b_novel_fps"))
    val srcAgg = priorSources.select(col(srcCol).as("__s"))
      .union(batch.select(col(srcCol).as("__s")))
      .distinct()
      .agg(count(lit(1)).as("all_sources"))
    val mergedHist = priorHist
      .unionByName(tokenHistogram(batch, textCol, binWidth, numBins))
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    val histMed = histMedianLo(mergedHist, binWidth)
    prior.crossJoin(broadcast(bAgg))
      .crossJoin(broadcast(novelAgg))
      .crossJoin(broadcast(srcAgg))
      .crossJoin(broadcast(histMed))
      .select(
        (col("n_docs") + col("b_docs")).as("n_docs"),
        col("all_sources").as("n_sources"),
        (col("n_tokens") + col("b_tokens")).as("n_tokens"),
        (col("n_bpe_tokens") + col("b_btokens")).as("n_bpe_tokens"),
        (col("n_unique_fps") + col("b_novel_fps")).as("n_unique_fps"),
        (col("n_docs") + col("b_docs") -
          (col("n_unique_fps") + col("b_novel_fps"))).as("n_dup_docs"),
        (col("n_empty_docs") + col("b_empty")).as("n_empty_docs"),
        greatest(col("max_tokens"), col("b_max")).as("max_tokens"),
        col("p50_tokens_hist_lo"))
  }

  /** Distribution-drift audit between two corpus slices (new crawl vs
    * reference, today vs yesterday) over the token-length histogram —
    * the PSI use case done in EXACT integers: a bin drifts when its
    * SHARE differs by more than ratioNum/ratioDen in either direction,
    * decided by cross-multiplication
    * (cnt_a·tot_b·den > cnt_b·tot_a·num), so there is no division, no
    * float, no log — the verdict is bit-portable to the SQL oracle and
    * immune to summation-order noise, unlike the log-based PSI index
    * (which this audit replaces; consumers wanting the scalar can
    * compute it FROM these exact per-bin counts downstream, off the
    * gate path). Products ride DECIMAL(38,0): three 1e12-scale factors
    * stay < 1e38 — no overflow at 100 TB counts (ANSI mode would error
    * loudly, not wrap, if that assumption ever broke).
    *
    * Scale shape: each slice folds to a ≤ numBins+1-row census
    * (partial-combining count, one scan per slice), the full-outer
    * bin join is census-sized, and the 1-row totals attach as a
    * scalar subquery (no cross-join fan in the plan). Output:
    * (bin, cnt_a, cnt_b, drifted), zero-filled on both sides. A bin
    * empty in one slice but occupied in the other always drifts (share
    * r·0 is exceeded by any positive share); two empty slices report
    * nothing. */
  def histogramDrift(a: DataFrame, b: DataFrame, textCol: String,
      binWidth: Long, numBins: Int, ratioNum: Long,
      ratioDen: Long): DataFrame = {
    require(ratioDen > 0 && ratioNum >= ratioDen,
      s"drift ratio $ratioNum/$ratioDen must be >= 1")
    val dec = "decimal(38,0)"
    val joined = tokenHistogram(a, textCol, binWidth, numBins)
      .withColumnRenamed("cnt", "cnt_a")
      .join(tokenHistogram(b, textCol, binWidth, numBins)
        .withColumnRenamed("cnt", "cnt_b"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    // totals ride in as ONE scalar subquery (the q120/packContexts
    // discipline) — no 1-row cross join, so the plan carries no
    // BNLJ/CartesianProduct for the audit to except; the re-aggregated
    // branch is census-sized (≤ numBins+1 rows), not a corpus rescan
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val totals = joined.agg(struct(sum(col("cnt_a")).as("tot_a"),
      sum(col("cnt_b")).as("tot_b")).as("tt"))
    joined
      .withColumn("__tt",
        Bridge.column(ScalarSubquery(Bridge.analyzed(totals))))
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        ((col("cnt_a").cast(dec) * col("__tt.tot_b") * lit(ratioDen) >
          col("cnt_b").cast(dec) * col("__tt.tot_a") * lit(ratioNum)) ||
         (col("cnt_b").cast(dec) * col("__tt.tot_a") * lit(ratioDen) >
          col("cnt_a").cast(dec) * col("__tt.tot_b") * lit(ratioNum)))
          .as("drifted"))
  }
}
