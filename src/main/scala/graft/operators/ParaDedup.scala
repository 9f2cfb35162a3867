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
  * Scale shape: the corpus-wide group is on the 16-byte md5 fingerprint
  * (paragraph TEXT never enters that shuffle — `min(struct(doc_id,
  * pos))` partial-aggregates map-side, so the exchange carries one
  * 20-byte winner per distinct paragraph per map task); the winner set
  * joins back fingerprint-to-fingerprint; reassembly groups by doc_id.
  * Three narrow shuffles, no corpus-wide sort, no window over the
  * corpus. The per-doc `collect_list` in [[reassemble]] is bounded by
  * single-document size — the output row must hold the document anyway.
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

  /** Corpus-wide keep-first over (doc_id, pos, para) rows: one group on
    * the fingerprint to elect each paragraph's first occurrence, one
    * fingerprint join to keep only winners. */
  def dedupKeepFirst(paras: DataFrame): DataFrame = {
    val first = paras
      .groupBy(Dedup.fingerprint(col("para")).as("__fp"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__keep"))
    paras
      .join(first, Dedup.fingerprint(col("para")) === col("__fp"))
      .filter(col("doc_id") === col("__keep.doc_id") &&
        col("pos") === col("__keep.pos"))
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
