package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection — substring-level dedup
  * (the ExactSubstr idea: a span that appears more than once in the
  * corpus is memorization fuel and should be cut, even when the
  * documents containing it are not near-duplicates).
  *
  * Positional word k-grams are hashed and counted corpus-wide; any
  * k-gram occurring more than once marks its positions, and per
  * document the marked positions merge into MAXIMAL spans
  * (gaps-and-islands: consecutive flagged positions share one span).
  *
  * Scale honesty: unlike the LSH dedup tiers, this operator's exchange
  * is inherently O(corpus k-grams) — the count and the join-back both
  * move one 16-byte digest row per position (map-side combined; the
  * reference algorithm uses a single-machine suffix array, which does
  * not distribute). The k-gram stream is the cost of the semantics;
  * what stays small is the ROW WIDTH (digest + position, never text)
  * and the flagged fraction that reaches the window stage.
  */
object SpanDedup {

  /** (doc_id, pos, h): one 16-byte digest per k-gram position. */
  def positionalHashes(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        posexplode(Dedup.wordShingles(col("__w"), k)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"), md5(col("sh")).as("h"))

  /** Maximal duplicated spans per document. Output: (doc_id,
    * span_start, span_words, n_grams) — span_start is the 0-based word
    * offset, span_words the span length in words (last gram start −
    * first + k), n_grams how many duplicated k-gram positions merged
    * into it. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val hashes = positionalHashes(docs, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val dup = hashes.groupBy(col("h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("h"))
    val flagged = hashes.join(dup, "h")
      .select(col("doc_id"), col("pos"))
    // gaps-and-islands: consecutive positions get the same (pos − rank)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    flagged
      .withColumn("__isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).as("__start"),
        (max(col("pos")) - min(col("pos")) + lit(k)).as("__words"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"),
        col("__start").cast("long").as("span_start"),
        col("__words").cast("long").as("span_words"), col("n_grams"))
  }
}
