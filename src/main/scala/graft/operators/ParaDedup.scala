package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sub-document (paragraph / line-level) deduplication — the C4 /
  * RefinedWeb curation step the whole-document tiers in [[Dedup]] miss:
  * boilerplate paragraphs (headers, navigation, license blocks) recur
  * across millions of pages even when every containing document is
  * unique. Duplicate paragraphs are removed CORPUS-WIDE and documents
  * are reassembled from their surviving paragraphs.
  *
  * Keep-first rule: a paragraph occurrence survives iff it is the first
  * occurrence of its normalized fingerprint corpus-wide, ordered by
  * (doc_id, pos) — deterministic, engine-portable, and the convention
  * the document-level tiers use (smallest id wins).
  *
  * Scale shape: keep-first is a window partitioned by the 16-byte md5
  * fingerprint — paragraph rows cross exactly ONE exchange (any exact
  * sub-document dedup that emits surviving text must move the text to
  * its winner-decision site at least once; the winner set is O(distinct
  * paragraphs), far beyond broadcast, so join-back forms pay the same
  * exchange PLUS a second pipeline scan for the winner election);
  * reassembly groups by doc_id. Two shuffles total, each keyed narrow,
  * no corpus-wide sort. The per-doc `collect_list` in [[reassemble]] is
  * bounded by single-document size — the output row must hold the
  * document anyway.
  */
object ParaDedup {

  /** Explode documents into ordered paragraphs on a delimiter regex
    * ("\n{2,}" for paragraph breaks, "\n" for line-level dedup).
    * Blank segments are dropped; `pos` preserves original order. */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
      delimRe: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), delimRe)).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)

  /** Corpus-wide keep-first over (doc_id, pos, para) rows: rank each
    * paragraph's occurrences by (doc_id, pos) within its fingerprint
    * and keep rank 1 — ONE scan and ONE exchange total. The
    * elect-winners-then-join-back form was tried and is strictly worse:
    * the join still ships full paragraph rows through its fp exchange
    * (the winner set is O(distinct paragraphs), far beyond broadcast at
    * corpus scale), and its aggregate side re-runs the upstream
    * paragraphize/chunk pipeline a second time. */
  def dedupKeepFirst(paras: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Dedup.fingerprint(col("para")))
      .orderBy(col("doc_id").asc, col("pos").asc)
    paras
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("pos"), col("para"))
  }

  /** Paragraph-fingerprint projection — the LEDGER a daily pipeline
    * stores between runs: one 16-byte md5 per paragraph occurrence.
    * Deliberately NOT distinct'd here (a distinct exchanges every
    * fingerprint; [[incrementalKeepFirst]] tolerates duplicate ledger
    * rows by design) — dedup the stored table once at write time if
    * storage matters. Append each batch's KEPT paragraphs' fingerprints
    * to roll the ledger forward. */
  def paragraphFingerprints(paras: DataFrame): DataFrame =
    paras.select(Dedup.fingerprint(col("para")).as("fp"))

  /** O(new-batch) incremental form of [[dedupKeepFirst]] — the sibling
    * q65/q108/q116 give the document-level tiers, closing the
    * daily-crawl cliff for paragraph dedup (round-7 verdict #2): a new
    * batch's paragraph survives iff its fingerprint is absent from the
    * HISTORY ledger AND it is the first occurrence within the batch by
    * (doc_id, pos). Equivalent to running [[dedupKeepFirst]] over
    * history ∪ batch with history ranked first, without touching
    * history text: the ledger membership check is the bloom-gated exact
    * core shared with [[Dedup.incrementalExactBloom]]
    * ([[Dedup.bloomKnownFlag]]) — ledger fingerprints fold to
    * partial-combined bloom sketches and are probed MAP-SIDE against
    * the broadcast candidate set, so the ledger NEVER crosses an
    * exchange; the only batch-wide exchange is the intra-batch
    * keep-first window, keyed by fingerprint and carrying only
    * ledger-miss paragraphs. Size `expectedItems` to the ledger
    * cardinality (see the clamp-conf note on [[Dedup.bloomKnownFlag]]). */
  def incrementalKeepFirst(newParas: DataFrame, ledger: DataFrame,
      ledgerFpCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.03): DataFrame = {
    val withFp = newParas.select(col("doc_id"), col("pos"), col("para"))
      .withColumn("__fp", Dedup.fingerprint(col("para")))
    val flagged = Dedup.bloomKnownFlag(withFp, "__fp", ledger, ledgerFpCol,
      expectedItems, fpp)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp"))
      .orderBy(col("doc_id").asc, col("pos").asc)
    flagged
      .filter(!col("__known_flag"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("pos"), col("para"))
  }

  /** Reassemble surviving paragraphs into documents in original order.
    * Documents whose every paragraph was a duplicate DISAPPEAR (a full
    * duplicate document contributes nothing) — anti-join the output
    * against the input upstream if the drop needs auditing. */
  def reassemble(kept: DataFrame, delim: String = " "): DataFrame =
    kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")),
          delim).as("text_dedup"),
        count(lit(1)).as("n_paras_kept"))
}
