package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any word
  * k-gram with an evaluation/benchmark set (the standard train-set
  * hygiene pass before an LLM training run — e.g. the 13-gram overlap
  * rule; on this tiny-vocabulary synthetic corpus the analog is k=3).
  *
  * Scale design: benchmark sets are tiny (thousands of eval documents)
  * next to a 100 TB corpus, so the benchmark's distinct shingle set is
  * BROADCAST and the corpus side never shuffles its full shingle
  * stream: explode → broadcast hash join (map-side filter) — only the
  * MATCHED (doc, shingle) pairs shuffle (distinct + per-doc count),
  * a tiny fraction of the corpus. The corpus text itself is touched
  * exactly once, map-side.
  */
object Decontam {

  /** Per-document contamination report against `benchmark`.
    * Output: (doc_id, hit_ngrams, contaminated) — the number of the
    * document's DISTINCT k-shingles that appear anywhere in the
    * benchmark set, and a boolean flag. Documents with zero overlap are
    * kept (left join), so the report covers the whole corpus.
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    // dedup = false, then distinct AFTER the broadcast filter: the
    // corpus-wide shingle distinct would shuffle every shingle of the
    // corpus; filtering first means the only shuffled rows are actual
    // benchmark matches (a tiny fraction), deduped to distinct
    // (doc, shingle) so repeats inside one doc still count once.
    val corpusSh = Dedup.explodedShingles(corpus, idCol, textCol, k,
      dedup = false)
    val benchSh = Dedup.explodedShingles(benchmark, idCol, textCol, k)
      .select(col("sh")).distinct()
    val hits = corpusSh
      .join(broadcast(benchSh), "sh")
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hit_ngrams"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hit_ngrams"), lit(0L)).as("hit_ngrams"))
      .withColumn("contaminated", col("hit_ngrams") > 0)
  }
}
