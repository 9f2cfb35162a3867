package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.Search

/** Retrieval family over `documents`: inverted-index construction and
  * conjunctive term search — the lookup machinery a curation pipeline
  * needs for decontamination checks and targeted subset pulls.
  */
object SearchQueries extends QueryPack {

  private val wordsSql =
    raw"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

  // ---------------------------------------------------------------- q92
  // Inverted index snapshot: per token document frequency, collection
  // frequency, and the first 20 postings (ascending doc ids), JSON-
  // serialized — posting rows stay bounded regardless of corpus size
  // (df/cf carry the full counts).
  private val q92 = Q(
    "q92_inverted_index",
    (s, dir) => {
      Search.invertedIndex(Tables(s, dir, "documents"),
          "doc_id", "text", maxPostings = 20)
        .select(col("token"), col("df"), col("cf"),
          to_json(col("postings")).as("postings"))
        .orderBy(col("token"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents),
      counts AS (
        SELECT token, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
        FROM toks GROUP BY token),
      posts AS (
        SELECT token,
               CAST(to_json((list(doc_id ORDER BY doc_id ASC))[1:20]) AS VARCHAR)
                 AS postings
        FROM (SELECT DISTINCT token, doc_id FROM toks)
        GROUP BY token)
      SELECT c.token, c.df, c.cf, p.postings
      FROM counts c JOIN posts p USING (token)
      ORDER BY c.token
    """))

  // ---------------------------------------------------------------- q93
  // Conjunctive search: documents containing BOTH terms, ranked by
  // total term frequency. The token stream filters to the query terms
  // BEFORE the shuffle (decontamination discipline) — the exchange
  // carries O(hits), not O(corpus tokens).
  private val q93 = Q(
    "q93_conjunctive_search",
    (s, dir) => {
      Search.conjunctiveSearch(Tables(s, dir, "documents"),
          "doc_id", "text", terms = Seq("spark", "vector"), topN = 25)
        .orderBy(col("rnk"))
    },
    Some(s"""
      SELECT doc_id, tf_total, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, tf_total,
               ROW_NUMBER() OVER (ORDER BY tf_total DESC, doc_id ASC) AS rnk
        FROM (
          SELECT doc_id, COUNT(*) AS tf_total
          FROM (SELECT doc_id, UNNEST($wordsSql) AS token FROM documents)
          WHERE token IN ('spark', 'vector')
          GROUP BY doc_id
          HAVING COUNT(DISTINCT token) = 2))
      WHERE rnk <= 25
      ORDER BY rnk
    """))

  def all: Seq[Q] = Seq(q92, q93)
}
