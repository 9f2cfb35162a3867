package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking for training-data preparation: split each
  * document's token stream into fixed-size windows with overlap — the
  * standard pretraining / RAG-indexing reshape (chunk c starts at
  * c·stride and spans up to `chunkTokens` words; stride < chunkTokens
  * gives overlapping windows so no boundary context is lost).
  *
  * Everything is per-row (sequence → posexplode → slice/array_join), so
  * the operator is embarrassingly parallel: no shuffle, no state, scales
  * with the scan. The chunk TEXT is emitted for downstream tokenizers;
  * gate queries project its md5 fingerprint instead so result rows stay
  * small (see PipelineQueries q60).
  */
object Chunking {

  /** One row per (doc, chunk): (doc_id, chunk_idx, n_chunk_tokens,
    * chunk_text). Chunk starts: 0, stride, 2·stride, …; the LAST start
    * is the smallest multiple of stride with start + chunkTokens ≥ n,
    * so the tail is always covered and no chunk is fully contained in
    * its predecessor. Documents at or under chunkTokens words yield one
    * chunk. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1,
      s"chunkTokens=$chunkTokens, stride=$stride must be >= 1")
    docs
      .select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 1)
      .select(col("doc_id"), col("__w"),
        posexplode(sequence(lit(0),
          greatest(ceil((size(col("__w")) - lit(chunkTokens)) /
            lit(stride.toDouble)), lit(0L)).cast("int")))
          .as(Seq("chunk_idx", "__c")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        size(slice(col("__w"), col("__c") * stride + 1, lit(chunkTokens)))
          .as("n_chunk_tokens"),
        array_join(slice(col("__w"), col("__c") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
  }
}
