package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.Search

/** Retrieval family over `documents`: inverted-index construction and
  * conjunctive term search — the lookup machinery a curation pipeline
  * needs for decontamination checks and targeted subset pulls.
  */
object SearchQueries extends QueryPack {

  private[queries] val wordsSql =
    raw"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

  // ---------------------------------------------------------------- q92
  // Inverted index snapshot: per token document frequency, collection
  // frequency, and the first 20 postings (ascending doc ids), JSON-
  // serialized. Postings ride the native BoundedMinSetAgg, so the
  // aggregation BUFFER — not just the output row — stays O(20) even
  // for stopword tokens (df/cf carry the full counts).
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

  // --------------------------------------------------------------- q106
  // BM25-ranked disjunctive search over three query terms — the
  // standard relevance ranking next to q93's boolean AND. Token stream
  // filters to query terms below the exchange (O(hits) shuffle);
  // avgdl fans back as a 1-row broadcast; ln-derived scores rounded to
  // 6 decimals before ranking/hashing (the q68 discipline).
  private val q106 = Q(
    "q106_bm25_search",
    (s, dir) => {
      Search.bm25Search(Tables(s, dir, "documents"),
          "doc_id", "text", terms = Seq("spark", "vector", "hash"),
          topN = 20)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('spark', 'vector', 'hash')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q147
  // O(new) incremental inverted index: yesterday's stored (token, df,
  // cf, postings) snapshot absorbs the day's batch without
  // re-tokenizing history — df/cf add, postings top-k merge exactly
  // (disjoint doc ids), the stored index never crosses an exchange
  // (batch index broadcasts into a map-side merge join; new tokens
  // append via a broadcast anti join). The oracle is q92's PLAIN full
  // recompute over history ∪ batch, so the hash match proves the
  // index merge is exact — the incremental-family discipline applied
  // to the retrieval surface.
  private val q147 = Q(
    "q147_incremental_inverted_index",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val history = docs.filter(col("doc_id") % 3 > 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      Search.incrementalIndex(
          Search.invertedIndex(history, "doc_id", "text", maxPostings = 20),
          batch, "doc_id", "text", maxPostings = 20)
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

  // --------------------------------------------------------------- q222
  // Exact PHRASE search — the positional query class q93's doc-level
  // conjunction can't answer: terms at CONSECUTIVE positions via the
  // anchor trick (each hit token emits (doc, pos − offset) for every
  // offset its term occupies in the phrase; a (doc, anchor) group
  // holding all |phrase| offsets is an occurrence). The phrase
  // deliberately REPEATS a term ("order big order") so the
  // multi-offset fan is exercised, not just the 1:1 path. Token
  // stream filters to the phrase terms before any exchange (the q93
  // discipline); top-N is TakeOrderedAndProject. The oracle checks
  // consecutive positions directly — two different algorithms, one
  // answer.
  private val q222 = Q(
    "q222_phrase_search",
    (s, dir) => {
      Search.phraseSearch(Tables(s, dir, "documents"), "doc_id", "text",
          phrase = Seq("order", "big", "order"), topN = 25)
        .orderBy(col("rnk"))
    },
    Some(raw"""
      WITH norm AS (
        SELECT doc_id, $wordsSql AS w FROM documents),
      occ AS (
        SELECT doc_id, COUNT(*) AS n_occurrences
        FROM norm, UNNEST(generate_series(1, len(w) - 2)) t(i)
        WHERE len(w) >= 3
          AND w[i] = 'order' AND w[i+1] = 'big' AND w[i+2] = 'order'
        GROUP BY doc_id)
      SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences,
             CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT doc_id, n_occurrences,
               ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, doc_id ASC)
                 AS rnk
        FROM occ)
      WHERE rnk <= 25
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q225
  // Phrase search over the STORED positional index — the q194/q208
  // build/apply discipline on the search axis: history's (token, doc,
  // pos) postings are the persisted table, the day's batch appends by
  // plain UNION (append-only ids make the union the exact merge — no
  // aggregation to reconcile, unlike q147's df/cf/postings), and the
  // query tokenizes NOTHING — the phrase terms filter the posting
  // scan. Oracle = q222's direct-recompute SQL: the stored-index path
  // and the tokenize-everything path must land the same answer.
  private val q225 = Q(
    "q225_phrase_search_indexed",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val stored = Search.positionalIndex(
        docs.filter(col("doc_id") % 3 > 0), "doc_id", "text")
      val day = Search.positionalIndex(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      Search.phraseSearchIndexed(stored.unionByName(day), "doc_id",
          phrase = Seq("order", "big", "order"), topN = 25)
        .orderBy(col("rnk"))
    },
    Some(raw"""
      WITH norm AS (
        SELECT doc_id, $wordsSql AS w FROM documents),
      occ AS (
        SELECT doc_id, COUNT(*) AS n_occurrences
        FROM norm, UNNEST(generate_series(1, len(w) - 2)) t(i)
        WHERE len(w) >= 3
          AND w[i] = 'order' AND w[i+1] = 'big' AND w[i+2] = 'order'
        GROUP BY doc_id)
      SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences,
             CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT doc_id, n_occurrences,
               ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, doc_id ASC)
                 AS rnk
        FROM occ)
      WHERE rnk <= 25
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q227
  // DELETE from the stored inverted index — the affected-group
  // re-election discipline (q224) on the search pillar: a bounded-min
  // posting list cannot un-merge, so tokens touched by the deleted
  // docs re-elect df/cf/postings from the surviving rows of the
  // stored positional table (no text is ever re-tokenized), untouched
  // tokens pass through, a fully-dead token vanishes. With q147
  // (append) this closes the search index's lifecycle. Oracle = the
  // q92 snapshot recomputed over the surviving corpus.
  private val q227 = Q(
    "q227_inverted_index_purge",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val postings = Search.positionalIndex(docs, "doc_id", "text")
      val stored = Search.indexFromPostings(postings, "doc_id",
        maxPostings = 20)
      val deleted = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"))
      Search.purgeInvertedIndex(stored, postings, deleted, "doc_id",
          maxPostings = 20)
        .select(col("token"), col("df"), col("cf"),
          to_json(col("postings")).as("postings"))
        .orderBy(col("token"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents
        WHERE doc_id % 9 <> 0),
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

  // --------------------------------------------------------------- q228
  // BM25 served from STORED statistics tables — the build/apply split
  // on the ranked-search axis: term frequencies derive from the
  // positional table (no text), doc lengths persist at build time
  // (from text, so zero-token docs keep their place in n_docs/avgdl),
  // and the query filters the tf scan to its terms and re-derives df
  // — nothing re-tokenizes at query time. One scoring tail shared
  // with q106's direct form; different terms here so the two gates
  // don't collapse into one answer.
  private val q228 = Q(
    "q228_bm25_indexed",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val postings = Search.positionalIndex(docs, "doc_id", "text")
      Search.bm25SearchIndexed(
          Search.termFrequencies(postings, "doc_id"),
          Search.docLengths(docs, "doc_id", "text"),
          "doc_id", terms = Seq("stream", "window", "merge"), topN = 20)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('stream', 'window', 'merge')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q232
  // Inverted-index UPSERT — q231's restatement discipline on the
  // search pillar, composed from the two verbs that already exist:
  // the restated docs' old occurrences leave via q227's
  // affected-token re-election, and their NEW text (deterministically
  // prefixed, so the oracle can replay it) absorbs via q147's
  // incremental merge — whose append-only precondition the purge
  // re-establishes (the restated ids are gone from the purged index,
  // so re-adding them IS a new-id append). History text is never
  // re-tokenized; work is O(occurrences of affected tokens) + O(new
  // text). Oracle = the q92 snapshot over the corpus with the
  // restated docs' text replaced.
  private val q232 = Q(
    "q232_inverted_index_upsert",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val postings = Search.positionalIndex(docs, "doc_id", "text")
      val stored = Search.indexFromPostings(postings, "doc_id",
        maxPostings = 20)
      val restatedIds = docs.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"))
      val restatedNew = docs.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"),
          concat(lit("restated "), col("text")).as("text"))
      Search.incrementalIndex(
          Search.purgeInvertedIndex(stored, postings, restatedIds,
            "doc_id", maxPostings = 20),
          restatedNew, "doc_id", "text", maxPostings = 20)
        .select(col("token"), col("df"), col("cf"),
          to_json(col("postings")).as("postings"))
        .orderBy(col("token"))
    },
    Some(s"""
      WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN 'restated ' || text
                    ELSE text END AS text
        FROM documents),
      toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM docs2),
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

  // --------------------------------------------------------------- q242
  // HYBRID retrieval — reciprocal rank fusion of the lexical and
  // semantic rankings, the shape every RAG/serving stack runs: BM25
  // answers "which docs use these words", the vector top-k answers
  // "which docs mean this", and RRF fuses them through RANKS alone
  // (a log-score and an L2 distance share no scale — that is why RRF
  // exists). Contributions are exact integer micro-units
  // (10⁶ DIV (60 + rank), the standard k=60), so the fused ranking
  // hash-gates; docs in BOTH lists float to the top, which is the
  // hybrid payoff. Both input rankings are O(topN) by construction —
  // the fusion is bounded regardless of corpus size.
  private val q242 = Q(
    "q242_hybrid_rrf_search",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
      val text = Search.bm25Search(docs, "doc_id", "text",
        terms = Seq("spark", "vector", "hash"), topN = 20)
      val vec = graft.operators.Ivf.bruteTopK(e,
          e.filter(col("vec_id") === 7), "vec_id", "embedding", topK = 20)
        .select(col("n_id").as("doc_id"), col("rnk"))
      Search.rrfFuse(
          Seq(text.select(col("doc_id"), col("rnk")), vec),
          "doc_id", kRrf = 60, topN = 10)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('spark', 'vector', 'hash')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      bmscored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score
        FROM parts GROUP BY doc_id),
      bm AS (
        SELECT doc_id, rnk FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rnk
          FROM bmscored)
        WHERE rnk <= 20),
      vx AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x -> floor(x * 1000000.0)) AS qvec
        FROM embeddings),
      vr AS (
        SELECT doc_id, rnk FROM (
          SELECT n.vec_id AS doc_id,
                 ROW_NUMBER() OVER (ORDER BY
                     list_dot_product(q.qvec, q.qvec)
                     - 2.0 * list_dot_product(q.qvec, n.qvec)
                     + list_dot_product(n.qvec, n.qvec) ASC,
                   n.vec_id ASC) AS rnk
          FROM vx q, vx n
          WHERE q.vec_id = 7 AND n.vec_id <> 7)
        WHERE rnk <= 20),
      u AS (
        SELECT doc_id, rnk FROM bm
        UNION ALL
        SELECT doc_id, rnk FROM vr),
      f AS (
        SELECT doc_id, SUM(1000000 // (60 + rnk)) AS rrf_micro,
               COUNT(*) AS n_lists
        FROM u GROUP BY doc_id)
      SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
             CAST(n_lists AS BIGINT) AS n_lists,
             CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT doc_id, rrf_micro, n_lists,
               ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id ASC)
                 AS rnk
        FROM f)
      WHERE rnk <= 10
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q243
  // MORE-LIKE-THIS — document-as-query retrieval (Lucene's MLT shape):
  // the query document's top-3 TF-IDF tokens become the BM25 query,
  // so "find documents like this one" needs no hand-written terms.
  // Term selection stays distributed — the one-doc query tf broadcasts
  // into the corpus df census (never the reverse: vocabulary is
  // corpus-sized), the ranking window runs over that single document's
  // vocabulary, and the winners restrict the corpus tf table through a
  // broadcast semi-join. The query document is excluded from
  // candidates AND the restricted df (it trivially contains every
  // query term). One scoring tail with q106 — same formula, the terms
  // now come from data.
  private val q243 = Q(
    "q243_more_like_this",
    (s, dir) => {
      Search.moreLikeThis(Tables(s, dir, "documents"), "doc_id", "text",
          queryId = 7L, nTerms = 3, topN = 10)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      dfall AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df_all
        FROM toks GROUP BY token),
      n AS (SELECT COUNT(*) AS n_all FROM documents),
      qtf AS (
        SELECT token, COUNT(*) AS qtf FROM toks
        WHERE doc_id = 7 GROUP BY token),
      tsc AS (
        SELECT q.token,
               ROUND(CAST(q.qtf AS DOUBLE) *
                 ln(CAST(n.n_all AS DOUBLE) / CAST(d.df_all AS DOUBLE)),
                 6) AS tscore
        FROM qtf q JOIN dfall d USING (token) CROSS JOIN n),
      qterms AS (
        SELECT token FROM (
          SELECT token,
                 ROW_NUMBER() OVER (ORDER BY tscore DESC, token ASC)
                   AS trnk
          FROM tsc)
        WHERE trnk <= 3),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks
        WHERE doc_id <> 7 AND token IN (SELECT token FROM qterms)
        GROUP BY doc_id, token),
      dl2 AS (SELECT * FROM dl WHERE doc_id <> 7),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl2),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (v.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / v.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl2 d USING (doc_id)
        CROSS JOIN navg v),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 10
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q244
  // BEST-SNIPPET extraction — the "highlight" a search tier renders
  // next to every hit: the 8-token window holding the most query-term
  // hits per document (earliest on ties), with its text. Candidate
  // windows anchor at HIT positions only, so per-doc cost is O(hits)
  // through one doc-partitioned RANGE window — no per-window explode,
  // no self-join; only the 10 winning docs join back to their word
  // arrays to render text.
  private val q244 = Q(
    "q244_best_snippet",
    (s, dir) => {
      Search.bestSnippet(Tables(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "vector", "hash"), windowTokens = 8,
          topN = 10)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH words AS (
        SELECT doc_id, $wordsSql AS w FROM documents),
      pos AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS start_pos, w[i] AS token
        FROM words, UNNEST(generate_series(1, len(w))) t(i)),
      hits AS (
        SELECT doc_id, start_pos FROM pos
        WHERE token IN ('spark', 'vector', 'hash')),
      sc AS (
        SELECT doc_id, start_pos,
               COUNT(*) OVER (PARTITION BY doc_id ORDER BY start_pos
                 RANGE BETWEEN CURRENT ROW AND 7 FOLLOWING) AS n_hits
        FROM hits),
      best AS (
        SELECT doc_id, start_pos, n_hits FROM (
          SELECT doc_id, start_pos, n_hits,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY n_hits DESC, start_pos ASC) AS rn
          FROM sc)
        WHERE rn = 1),
      top AS (
        SELECT doc_id, start_pos, n_hits,
               ROW_NUMBER() OVER (ORDER BY n_hits DESC, doc_id ASC)
                 AS rnk
        FROM best)
      SELECT t.doc_id, CAST(t.start_pos AS BIGINT) AS start_pos,
             CAST(t.n_hits AS BIGINT) AS n_hits,
             array_to_string(w[t.start_pos + 1:t.start_pos + 8], ' ')
               AS snippet,
             CAST(t.rnk AS INTEGER) AS rnk
      FROM top t JOIN words USING (doc_id)
      WHERE t.rnk <= 10
      ORDER BY t.rnk
    """))

  // --------------------------------------------------------------- q245
  // Snippets from the STORED positional index — q244's highlight
  // served the way a deployment serves it (the q225 discipline on the
  // snippet axis): hit positions come from the persisted postings
  // (history + the day's appended batch — append-only ids make the
  // union the exact merge), NOTHING re-tokenizes to find the windows,
  // and only the 10 winning docs tokenize to render their snippet
  // text. Oracle = q244's direct recompute, so the hash match proves
  // stored-index serving ≡ recompute.
  private val q245 = Q(
    "q245_snippet_indexed",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val stored = Search.positionalIndex(
        docs.filter(col("doc_id") % 3 > 0), "doc_id", "text")
      val day = Search.positionalIndex(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      Search.bestSnippetIndexed(stored.unionByName(day), docs,
          "doc_id", "text", terms = Seq("spark", "vector", "hash"),
          windowTokens = 8, topN = 10)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH words AS (
        SELECT doc_id, $wordsSql AS w FROM documents),
      pos AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS start_pos, w[i] AS token
        FROM words, UNNEST(generate_series(1, len(w))) t(i)),
      hits AS (
        SELECT doc_id, start_pos FROM pos
        WHERE token IN ('spark', 'vector', 'hash')),
      sc AS (
        SELECT doc_id, start_pos,
               COUNT(*) OVER (PARTITION BY doc_id ORDER BY start_pos
                 RANGE BETWEEN CURRENT ROW AND 7 FOLLOWING) AS n_hits
        FROM hits),
      best AS (
        SELECT doc_id, start_pos, n_hits FROM (
          SELECT doc_id, start_pos, n_hits,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY n_hits DESC, start_pos ASC) AS rn
          FROM sc)
        WHERE rn = 1),
      top AS (
        SELECT doc_id, start_pos, n_hits,
               ROW_NUMBER() OVER (ORDER BY n_hits DESC, doc_id ASC)
                 AS rnk
        FROM best)
      SELECT t.doc_id, CAST(t.start_pos AS BIGINT) AS start_pos,
             CAST(t.n_hits AS BIGINT) AS n_hits,
             array_to_string(w[t.start_pos + 1:t.start_pos + 8], ' ')
               AS snippet,
             CAST(t.rnk AS INTEGER) AS rnk
      FROM top t JOIN words USING (doc_id)
      WHERE t.rnk <= 10
      ORDER BY t.rnk
    """))

  // --------------------------------------------------------------- q253
  // SEGMENT LIFECYCLE for the positional postings index — q237's
  // compaction discipline on the SEARCH pillar: a restated document
  // re-tokenizes only itself and lands as a new segment (all its
  // (token, doc, pos) rows — the daily path stays O(new)); once
  // segments pile up, Layout.compactLatestMulti elects each doc's
  // latest row-SET (group election, so tokens the new version dropped
  // actually vanish — a row-level latest-wins never could) and
  // rewrites TOKEN-clustered, so term scans read contiguous,
  // min/max-prunable runs again. BM25 then serves from the compacted
  // table alone — tf from the surviving postings, dl as the per-doc
  // posting count (exactly docLengths: the tokenizer emits one
  // posting per word incl. the empty-text sentinel, so no doc drops
  // from n_docs/avgdl). Oracle = direct BM25 recompute over the
  // latest text of every doc.
  private val q253 = Q(
    "q253_postings_compaction",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val restated = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          concat(lit("restated "), col("text")).as("text"))
      val seg0 = Search.positionalIndex(docs, "doc_id", "text")
        .withColumn("seg", lit(0))
      val seg1 = Search.positionalIndex(restated, "doc_id", "text")
        .withColumn("seg", lit(1))
      val compacted = graft.operators.Layout.compactLatestMulti(
          seg0.unionByName(seg1), "doc_id", "seg", "token",
          numPartitions = 8)
        .select(col("token"), col("doc_id"), col("pos"))
      val tf = Search.termFrequencies(compacted, "doc_id")
      val dl = compacted.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dl"))
      Search.bm25SearchIndexed(tf, dl, "doc_id",
          terms = Seq("stream", "window", "merge"), topN = 20)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN 'restated ' || text
                    ELSE text END AS text
        FROM documents),
      toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM docs2),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('stream', 'window', 'merge')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q254
  // TOMBSTONE-MASKED text serving — q236's semantic on the search
  // pillar: deleted docs stop appearing in BM25 results NOW, via one
  // O(deleted) broadcast anti-join on the term-filtered tf rows,
  // BEFORE the q227 re-election rewrites any stored state. df
  // re-derives from the surviving rows; n_docs/avgdl come from the
  // stored 1-row stats ledger corrected by the tombstoned docs'
  // lengths alone (exact integral subtraction — the retract
  // discipline), never a corpus re-aggregate. Oracle = BM25 rebuilt
  // from scratch over the live corpus — masked serving must equal it
  // bit-for-bit, including the ln-derived score column.
  private val q254 = Q(
    "q254_tombstone_masked_bm25",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val postings = Search.positionalIndex(docs, "doc_id", "text")
      val tf = Search.termFrequencies(postings, "doc_id")
      val dl = Search.docLengths(docs, "doc_id", "text")
      val stats = Search.corpusStats(dl)
      val tombs = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"))
      Search.bm25SearchMasked(tf, dl, stats, tombs, "doc_id",
          terms = Seq("stream", "window", "merge"), topN = 20)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH live AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 0),
      toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM live),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('stream', 'window', 'merge')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q258
  // INCREMENTAL integrity manifest — q252's manifest treated as the
  // LEDGER it algebraically is: n_rows adds and the XOR checksum is
  // its own inverse (a group), so the postings manifest maintains at
  // O(new) per append (merge the batch's manifest — history is never
  // re-fingerprinted) and O(deleted) per delete (retract = merge the
  // deleted rows' manifest with negated count). The gate proves both
  // directions against direct re-derivation: merged(history, batch) ≡
  // manifest(full), and retract(full, deleted docs' rows) ≡
  // manifest(survivors) — bit-for-bit on the 60-bit XOR.
  private val q258 = Q(
    "q258_incremental_manifest",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      def manifest(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Layout.indexManifest(Seq(
          ("postings", Search.positionalIndex(d, "doc_id", "text"),
            concat_ws("|", col("token"), col("doc_id"), col("pos")))))
      val merged = graft.operators.Layout.manifestMerge(
        manifest(docs.filter(col("doc_id") % 3 > 0)),
        manifest(docs.filter(col("doc_id") % 3 === 0)))
      val retracted = graft.operators.Layout.manifestRetract(
        manifest(docs),
        manifest(docs.filter(col("doc_id") % 9 === 0)))
      merged.withColumn("phase", lit("merged"))
        .unionByName(retracted.withColumn("phase", lit("retracted")))
        .orderBy(col("phase"))
    },
    Some(s"""
      WITH posti AS (
        SELECT n.doc_id, n.w[t.i] AS token, t.i - 1 AS pos
        FROM (SELECT doc_id, $wordsSql AS w FROM documents) n,
             UNNEST(generate_series(1, len(n.w))) t(i)),
      mfull AS (
        SELECT 'postings' AS table_name, COUNT(*) AS n_rows,
               COALESCE(bit_xor(
                 ('0x' || substr(md5(token || '|' || doc_id || '|' || pos),
                   1, 15))::BIGINT), 0) AS checksum
        FROM posti),
      msurv AS (
        SELECT 'postings' AS table_name, COUNT(*) AS n_rows,
               COALESCE(bit_xor(
                 ('0x' || substr(md5(token || '|' || doc_id || '|' || pos),
                   1, 15))::BIGINT), 0) AS checksum
        FROM posti WHERE doc_id % 9 <> 0)
      SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
             CAST(checksum AS BIGINT) AS checksum, phase
      FROM (
        SELECT table_name, n_rows, checksum, 'merged' AS phase FROM mfull
        UNION ALL
        SELECT table_name, n_rows, checksum, 'retracted' AS phase FROM msurv)
      ORDER BY phase
    """))

  // --------------------------------------------------------------- q259
  // STREAMING integrity manifest — q252/q258's ledger maintained
  // IN-FLIGHT: posting fingerprints compute in-row on each arriving
  // document (pure projection), and the running (n_rows, checksum)
  // pair is a Complete-mode global aggregate with ONE row of state
  // (count adds, XOR folds — manifestMerge's algebra is exactly why
  // micro-batch partials compose), so the verify-before-serve
  // artifact is ready the moment the drain finishes. Oracle = the
  // batch manifest over the same corpus.
  private val q259 = Q(
    "q259_stream_manifest",
    (s, dir) => {
      graft.streaming.StreamingOps.streamManifest(s, dir,
        "q259_manifest_sink")
    },
    Some(s"""
      WITH posti AS (
        SELECT n.doc_id, n.w[t.i] AS token, t.i - 1 AS pos
        FROM (SELECT doc_id, $wordsSql AS w FROM documents) n,
             UNNEST(generate_series(1, len(n.w))) t(i))
      SELECT 'postings' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COALESCE(bit_xor(
               ('0x' || substr(md5(token || '|' || doc_id || '|' || pos),
                 1, 15))::BIGINT), 0) AS BIGINT) AS checksum
      FROM posti
    """))

  // --------------------------------------------------------------- q262
  // ATTRIBUTE-FILTERED BM25 — the filter × text cell done honestly
  // (an attribute is NOT a term: "rank matches WHERE source = 'src3'"
  // restricts the ranking UNIVERSE, so n_docs/avgdl/df must be the
  // filtered corpus's — a post-filter on scores ranks against the
  // wrong globals): the stored tf/dl tables carry the attribute from
  // build time (positionalIndexed/docLengths ride-alongs — never a
  // query-time join back to the corpus), the predicate filters BOTH
  // scans (parquet pushdown at rest), and the unchanged bm25 tail
  // then derives df and the globals from exactly the filtered
  // universe. Oracle = BM25 over the source-restricted corpus.
  private val q262 = Q(
    "q262_filtered_bm25",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val postings = Search.positionalIndexed(docs, "doc_id", "text",
        Seq("source"))
      val tf = Search.termFrequencies(postings, "doc_id", Seq("source"))
      val dl = Search.docLengths(docs, "doc_id", "text", Seq("source"))
      Search.bm25SearchIndexed(
          tf.filter(col("source") === "src3").drop("source"),
          dl.filter(col("source") === "src3").drop("source"),
          "doc_id", terms = Seq("stream", "window", "merge"), topN = 20)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH live AS (
        SELECT doc_id, text FROM documents WHERE source = 'src3'),
      toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM live),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('stream', 'window', 'merge')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q300
  // Postings AS-OF serve — the q255 time-travel semantic on the TEXT
  // pillar, previously a LayoutSpec-only lane: a restated document
  // re-tokenizes only itself and lands its whole (token, doc, pos)
  // row-set as a new segment (q253's daily path); an as-of-0 read
  // elects each doc's latest row-set among segments ≤ 0 — the cutoff
  // is a plain segment predicate, pruning whole segment files at
  // rest — and BM25 served from the elected postings reproduces the
  // ORIGINAL corpus ranking exactly (tf from surviving postings, dl
  // as the per-doc posting count, n_docs/avgdl from the same table).
  // Oracle = direct BM25 recompute over the original text.
  private val q300 = Q(
    "q300_postings_asof_serve",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val restated = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          concat(lit("restated "), col("text")).as("text"))
      val seg0 = Search.positionalIndex(docs, "doc_id", "text")
        .withColumn("seg", lit(0))
      val seg1 = Search.positionalIndex(restated, "doc_id", "text")
        .withColumn("seg", lit(1))
      val asOf0 = graft.operators.Layout.compactAsOfMulti(
          seg0.unionByName(seg1), "doc_id", "seg", "token",
          numPartitions = 8, asOf = 0)
        .select(col("token"), col("doc_id"), col("pos"))
      val tf = Search.termFrequencies(asOf0, "doc_id")
      val dl = asOf0.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dl"))
      Search.bm25SearchIndexed(tf, dl, "doc_id",
          terms = Seq("stream", "window", "merge"), topN = 20)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, UNNEST($wordsSql) AS token FROM documents),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ('stream', 'window', 'merge')
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      scored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score,
               COUNT(*) AS n_terms
        FROM parts GROUP BY doc_id)
      SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, score, n_terms,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q322
  // CROSS-PILLAR RAG composition — the whole deployment under ONE
  // hash gate: curation VERDICTS (exact-dedup losers ∪ quality
  // failures ∪ docs sharing a 3-gram with the benchmark slice ∪ the
  // benchmark docs themselves — q16/q24/q219's verdicts, each
  // individually gated) become index TOMBSTONES (one O(verdict)
  // semi-join purges the stored flat ANN index AND restricts the BM25
  // corpus — its df/avgdl/n_docs statistics recompute over SURVIVORS,
  // the detail a filter-at-rank-time shortcut gets wrong), and the
  // HYBRID serve fuses the lexical and routed-vector rankings through
  // RRF (q242's fusion). Every seam is a previously-gated verb; this
  // gate proves they COMPOSE — the q200/q247 one-hash discipline
  // spanning both pillars. Scale shape: verdicts are
  // incidence-proportional sets (never corpus² — the shingle join is
  // df-bucketed, the dedup keep-set a hash groupBy), the purge is one
  // semi-join on the stored index scan, and both rankings are O(topN)
  // into a bounded fusion.
  /** The shared curation VERDICT set (q322/q328): exact-dedup losers
    * ∪ quality failures ∪ docs sharing a 3-gram with the benchmark
    * slice ∪ the benchmark docs themselves — each verdict an
    * individually-gated verb (q16/q24/q219), composed and pinned
    * because BOTH serving pillars read it (index tombstones + BM25
    * corpus restriction). Returns the SURVIVOR (doc_id) frame,
    * persisted. */
  private def curatedLive(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val keep = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val bench = graft.operators.Dedup.explodedShingles(
        docs.filter(col("doc_id") % 25 === 0), "doc_id", "text", 3)
      .select(col("sh")).distinct()
    val contaminated = graft.operators.Dedup.explodedShingles(
        docs.filter(col("doc_id") % 25 =!= 0), "doc_id", "text", 3)
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    val qualityPass = docs
      .withColumn("__w", graft.operators.Dedup.words(col("text")))
      .filter(graft.operators.TextAnalysis.qualityMicro(col("text"),
        col("__w")) >= 600000L)
      .select(col("doc_id"))
    docs.select(col("doc_id"))
      .filter(col("doc_id") % 25 =!= 0)
      .join(keep, Seq("doc_id"), "left_semi")
      .join(qualityPass, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .transform(graft.util.CacheScope.persist)
  }

  /** The verdict CTEs' DuckDB twin (q322/q328's shared oracle
    * prefix): keepers/qq/cbad → `live` (survivor doc_ids). */
  private def curatedLiveSql: String = s"""
      keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM documents
        GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
      qb AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                 AS n_tokens,
               CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                 AS BIGINT) AS n_punct,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS BIGINT) AS n_digit,
               ${TextQueries.scoreSql("en")} AS s_en
        FROM (SELECT doc_id, text, $wordsSql AS w FROM documents)),
      qq AS (
        SELECT doc_id,
               CAST(ROUND(ROUND(
                 0.4 * least(n_chars / 500.0, 1.0)
               + 0.2 * (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 10.0, 1.0))
               + 0.2 * (1.0 - least((n_digit / greatest(n_chars, 1.0)) * 10.0, 1.0))
               + 0.2 * least((s_en / greatest(CAST(n_tokens AS DOUBLE), 1.0)) * 5.0, 1.0),
                 6) * 1000000) AS BIGINT) AS qm
        FROM qb),
      cnorm AS (
        SELECT doc_id, $wordsSql AS w FROM documents),
      cshingle AS (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sgram
        FROM cnorm, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 3),
      cbench AS (SELECT DISTINCT sgram FROM cshingle WHERE doc_id % 25 = 0),
      cbad AS (
        SELECT DISTINCT c.doc_id FROM cshingle c JOIN cbench USING (sgram)
        WHERE c.doc_id % 25 <> 0),
      live AS (
        SELECT d.doc_id FROM documents d
        JOIN keepers k USING (doc_id)
        JOIN qq USING (doc_id)
        WHERE qq.qm >= 600000
          AND d.doc_id % 25 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM cbad))"""

  /** The survivor-stats BM25 CTEs (q322/q328's shared oracle middle):
    * toks/dl/navg/tf/dfreq/parts over `live` → `bm` (doc_id,
    * rnk ≤ 20) for the given terms. */
  private def survivorBm25Sql(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""
      toks AS (
        SELECT d.doc_id, UNNEST($wordsSql) AS token
        FROM documents d JOIN live USING (doc_id)),
      dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      navg AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token IN ($inList)
        GROUP BY doc_id, token),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      parts AS (
        SELECT t.doc_id,
               ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (0.25 + 0.75 * d.dl / n.avgdl)) AS part
        FROM tf t
        JOIN dfreq f USING (token)
        JOIN dl d USING (doc_id)
        CROSS JOIN navg n),
      bmscored AS (
        SELECT doc_id, ROUND(SUM(part), 6) AS score
        FROM parts GROUP BY doc_id),
      bm AS (
        SELECT doc_id, rnk FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rnk
          FROM bmscored)
        WHERE rnk <= 20)"""
  }

  private val q322 = Q(
    "q322_rag_curation_hybrid_serve",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
      // the verdict set, pinned: BOTH pillars read it (BM25 corpus
      // restriction + index purge)
      val live = curatedLive(s, dir)
      val text = Search.bm25Search(
        docs.join(live, Seq("doc_id"), "left_semi"), "doc_id", "text",
        terms = Seq("spark", "vector", "hash"), topN = 20)
      val purgedIdx = graft.queries.SimFixtures.flatIndex(s, dir)
        .join(live.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
      val vec = graft.operators.Ivf.filteredSearch(
          graft.queries.SimFixtures.coarse(s, dir), purgedIdx,
          e.filter(col("vec_id") === 7), "vec_id", "embedding",
          lit(true), nprobe = 8, topK = 20)
        .select(col("n_id").as("doc_id"), col("rnk"))
      Search.rrfFuse(
          Seq(text.select(col("doc_id"), col("rnk")), vec),
          "doc_id", kRrf = 60, topN = 10)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH
$curatedLiveSql,
${survivorBm25Sql(Seq("spark", "vector", "hash"))},
      vx AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x -> floor(x * 1000000.0)) AS qvec
        FROM embeddings),
      vr AS (
        SELECT doc_id, rnk FROM (
          SELECT n.vec_id AS doc_id,
                 ROW_NUMBER() OVER (ORDER BY
                     list_dot_product(q.qvec, q.qvec)
                     - 2.0 * list_dot_product(q.qvec, n.qvec)
                     + list_dot_product(n.qvec, n.qvec) ASC,
                   n.vec_id ASC) AS rnk
          FROM vx q, vx n
          WHERE q.vec_id = 7 AND n.vec_id <> 7
            AND n.vec_id IN (SELECT doc_id FROM live))
        WHERE rnk <= 20),
      u AS (
        SELECT doc_id, rnk FROM bm
        UNION ALL
        SELECT doc_id, rnk FROM vr),
      f AS (
        SELECT doc_id, SUM(1000000 // (60 + rnk)) AS rrf_micro,
               COUNT(*) AS n_lists
        FROM u GROUP BY doc_id)
      SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
             CAST(n_lists AS BIGINT) AS n_lists,
             CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT doc_id, rrf_micro, n_lists,
               ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id ASC)
                 AS rnk
        FROM f)
      WHERE rnk <= 10
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q328
  // CROSS-PILLAR RAG on the GRAPH serving pillar — q322's composition
  // moved to the pillar whose tombstone-mask semantics are the subtle
  // ones, over a WIDER query panel (vec_id < 5, was one query):
  // curation verdicts (q322's exact set, shared code) become WALK
  // tombstones — graphSearchMasked routes THROUGH dead vertices (on a
  // pruned graph each surviving waypoint is often the only path, so
  // masking traversal would disconnect it) and masks at rank time
  // over the bounded evaluated-candidate union, k back-filling from
  // live candidates — while the BM25 corpus restricts to survivors
  // with df/avgdl/n_docs recomputed (the q322 detail a
  // filter-at-rank-time shortcut gets wrong), and the whole panel
  // fuses per query in ONE keyed RRF pass (Search.rrfFuseBy — N
  // queries, one exchange, never N single-query fusions). Scale
  // shape: tombstones are verdict-proportional, the walk state
  // |Q|·beam broadcast rows, the fusion O(|Q|·topN). Oracle = the
  // verdict CTEs + survivor BM25 + the q313-class masked walk replay
  // + the per-query fusion.
  private val q328 = Q(
    "q328_rag_graph_masked_serve",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
      val live = curatedLive(s, dir)
      val text = Search.bm25Search(
        docs.join(live, Seq("doc_id"), "left_semi"), "doc_id", "text",
        terms = Seq("spark", "vector", "hash"), topN = 20)
      // verdict → tombstone: every indexed id the curation did NOT
      // keep (O(verdict) — the same set the q322 purge removes)
      val dead = e.select(col("vec_id"))
        .join(live.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_anti")
      val qPanel = e.filter(col("vec_id") < 5)
      val vec = graft.operators.Similarity.graphSearchMasked(
          graft.queries.SimFixtures.prunedFlat(s, dir), e, qPanel,
          "vec_id", "embedding", dead, entryK = 2, beam = 5, hops = 2,
          topK = 20)
        .select(col("q_id"), col("n_id").as("doc_id"), col("rnk"))
      // the lexical ranking is panel-invariant (fixed terms): fan the
      // bounded topN list across the query spine, then fuse per q_id
      val textQ = text.select(col("doc_id"), col("rnk"))
        .crossJoin(broadcast(qPanel.select(col("vec_id").as("q_id"))))
        .select(col("q_id"), col("doc_id"), col("rnk"))
      Search.rrfFuseBy(Seq(textQ, vec), Seq("q_id"), "doc_id",
          kRrf = 60, topN = 10)
        .orderBy(col("q_id"), col("rnk"))
    },
    Some(s"""
      WITH
$curatedLiveSql,
${survivorBm25Sql(Seq("spark", "vector", "hash"))},
      vx AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x -> floor(x * 1000000.0)) AS qvec
        FROM embeddings),
${SimilarityQueries.coarseCtes()},
${SimilarityQueries.seedGraphCtes()},
${SimilarityQueries.seedgCte},
${SimilarityQueries.rngKeptCtes(5, 1, 1)},
      pg AS (SELECT src, dst FROM kept5),
      ent AS (SELECT vec_id AS dst FROM embeddings ORDER BY vec_id LIMIT 2),
      qs AS (SELECT vec_id AS q_id, qvec FROM vx WHERE vec_id < 5),
${SimilarityQueries.walkCtes("", 2, 5, gName = "pg")},
      wseen AS (
        ${SimilarityQueries.seenSql("", 2)}),
      vkeep AS (
        SELECT sn.q_id, sn.dst, sn.d2 FROM wseen sn
        JOIN live l ON l.doc_id = sn.dst),
      vwalk AS (
        SELECT q_id, dst AS doc_id, rnk FROM (
          SELECT q_id, dst,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY d2 ASC, dst ASC) AS rnk
          FROM vkeep)
        WHERE rnk <= 20),
      fu AS (
        SELECT q.q_id, b.doc_id, b.rnk
        FROM bm b CROSS JOIN (SELECT q_id FROM qs) q
        UNION ALL
        SELECT q_id, doc_id, rnk FROM vwalk),
      ff AS (
        SELECT q_id, doc_id, SUM(1000000 // (60 + rnk)) AS rrf_micro,
               COUNT(*) AS n_lists
        FROM fu GROUP BY q_id, doc_id)
      SELECT q_id, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
             CAST(n_lists AS BIGINT) AS n_lists,
             CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT q_id, doc_id, rrf_micro, n_lists,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY rrf_micro DESC, doc_id ASC) AS rnk
        FROM ff)
      WHERE rnk <= 10
      ORDER BY q_id, rnk
    """))

  def all: Seq[Q] = Seq(q92, q93, q106, q147, q222, q225, q227, q228,
    q232, q242, q243, q244, q245, q253, q254, q258, q259, q262, q300,
    q322, q328)
}
