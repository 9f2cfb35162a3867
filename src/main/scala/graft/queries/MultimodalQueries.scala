package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.Multimodal

/** Multimodal-column plumbing under the oracle gate (SURVEY §7.5).
  * The payload is derived from text (UTF-8 bytes) so DuckDB can verify
  * byte-level results; the corpus is pure ASCII (verified), so char-class
  * counts equal byte-class counts.
  */
object MultimodalQueries extends QueryPack {

  // ---------------------------------------------------------------- q27
  // Payload + typed metadata through column expressions.
  private val q27 = Q(
    "q27_multimodal_meta",
    (s, dir) => {
      Multimodal.withPayload(Tables(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bytes"), col("digest"), col("kind"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS digest,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind
      FROM documents
      ORDER BY doc_id
    """))

  // ---------------------------------------------------------------- q28
  // The typed mapPartitions decode path (stubbed codec, real plumbing):
  // per-partition byte loops → MediaFeatures rows, verified byte-exact
  // against SQL character arithmetic.
  private val q28 = Q(
    "q28_multimodal_features",
    (s, dir) => {
      Multimodal.extractFeatures(s, Tables(s, dir, "documents"),
          "doc_id", "text")
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower,
             CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
             CAST(COALESCE(list_sum(list_transform(string_split(text, ''), x -> unicode(x))), 0) % 997 AS BIGINT) AS byte_sum_mod
      FROM documents
      ORDER BY doc_id
    """))

  def all: Seq[Q] = Seq(q27, q28)
}
