package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation (the north-star composition,
  * BASELINE.json): exact dedup → near-dup removal (LSH proposes, exact
  * Jaccard verifies) → quality gate → token accounting. One declarative
  * plan; every stage is an operator already verified in isolation.
  *
  * Shuffle budget at 100 TB: one groupBy on the content digest (exact),
  * the LSH band join over candidate buckets (near-dup), one broadcast
  * anti-join of the loser set, and the per-document column work is all
  * map-side. Nothing materializes the corpus more than once.
  */
object CorpusPipeline {

  /** Curate a document corpus. Returns the surviving documents with
    * their curation features. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5, minQuality: Double = 0.3): DataFrame = {
    // exact duplicates: keep the smallest id per content fingerprint.
    // The keep set is persisted: exactSurvivors feeds BOTH the near-dup
    // branch and the final anti-join, and each use would re-run the
    // fingerprint groupBy over the corpus otherwise.
    val exactKeep = Dedup.exact(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
      .transform(graft.util.CacheScope.persist)
    val exactSurvivors = docs.join(exactKeep, idCol)

    // near-duplicates among exact survivors: drop the larger id of
    // every verified pair (proposeVerify builds the shingle frame once
    // and shares it between the LSH propose and the Jaccard verify)
    val nearLosers = Dedup.proposeVerify(exactSurvivors, idCol, textCol)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_b").as(idCol)).distinct()
    val nearSurvivors = exactSurvivors.join(nearLosers, Seq(idCol), "left_anti")

    // quality gate + accounting
    nearSurvivors
      .withColumn("__w", Dedup.words(col(textCol)))
      .select(col(idCol),
        TextAnalysis.qualityScore(col(textCol), col("__w")).as("quality"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
        TextAnalysis.bpeTokenEstimate(col(textCol)).as("n_bpe_tokens"),
        Dedup.fingerprint(col(textCol)).as("fp"))
      .filter(col("quality") >= minQuality)
  }
}
