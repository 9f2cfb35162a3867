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
  * maxes max, sources union over a tiny table). The median is the one
  * field that does NOT merge exactly — the incremental row omits it
  * (an exact quantile needs the full distribution; the scale answer is
  * a mergeable sketch like approx_percentile, q70's documented
  * trade).
  */
object Datasheet {

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
    * `priorSources` the stored source census (tiny), `ledger` the
    * stored fingerprint table (the ONLY history-sized input — bloom
    * folds it to one sketch per partition, it never crosses an
    * exchange), `batch` the day's documents. Returns the updated
    * summary row minus `p50_tokens` (not exactly mergeable — see class
    * doc). The 1-row merge fans are the audited constant-broadcast
    * class. */
  def incremental(prior: DataFrame, priorSources: DataFrame,
      ledger: DataFrame, batch: DataFrame, srcCol: String,
      textCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
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
    prior.crossJoin(broadcast(bAgg))
      .crossJoin(broadcast(novelAgg))
      .crossJoin(broadcast(srcAgg))
      .select(
        (col("n_docs") + col("b_docs")).as("n_docs"),
        col("all_sources").as("n_sources"),
        (col("n_tokens") + col("b_tokens")).as("n_tokens"),
        (col("n_bpe_tokens") + col("b_btokens")).as("n_bpe_tokens"),
        (col("n_unique_fps") + col("b_novel_fps")).as("n_unique_fps"),
        (col("n_docs") + col("b_docs") -
          (col("n_unique_fps") + col("b_novel_fps"))).as("n_dup_docs"),
        (col("n_empty_docs") + col("b_empty")).as("n_empty_docs"),
        greatest(col("max_tokens"), col("b_max")).as("max_tokens"))
  }
}
