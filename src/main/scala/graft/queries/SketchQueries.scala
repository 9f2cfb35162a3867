package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.Sketch

/** Portable-sketch family: unlike HLL (q33/q70, gate-checked via an
  * exact twin + bounds flag), these sketches are pure md5 arithmetic,
  * so the DuckDB oracle reproduces the SKETCH itself bit-for-bit —
  * estimate values included, not just a tolerance check.
  */
object SketchQueries extends QueryPack {

  private def hashSql(c: String) =
    s"('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT"

  // ---------------------------------------------------------------- q82
  // KMV distinct-count sketch: distinct customers per order priority
  // from the 64 smallest member hashes, on the NATIVE KmvSketchAgg path
  // (the composed distinct+window+group form stays available as
  // Sketch.kmvDistinct and is spec-pinned equivalent) — the sketch
  // partial-merges map-side, ≤k longs per task·group reach the
  // exchange; the estimate (k-1)·2⁶⁰/h_k is plain double division —
  // engine-identical, so the oracle is unchanged.
  private val q82 = Q(
    "q82_kmv_distinct",
    (s, dir) => {
      Sketch.kmvDistinctNative(Tables(s, dir, "orders"),
          "o_orderpriority", "o_custkey", k = 64)
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""
      WITH hashed AS (
        SELECT DISTINCT o_orderpriority, ${hashSql("o_custkey")} AS h
        FROM orders),
      pruned AS (
        SELECT o_orderpriority, h FROM (
          SELECT o_orderpriority, h,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY h ASC) AS r
          FROM hashed)
        WHERE r <= 64),
      sketch AS (
        SELECT o_orderpriority, COUNT(*) AS n_sketch, MAX(h) AS kth_hash
        FROM pruned GROUP BY o_orderpriority),
      exact AS (
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct
        FROM orders GROUP BY o_orderpriority)
      SELECT s.o_orderpriority, s.n_sketch, s.kth_hash,
             CASE WHEN s.n_sketch < 64 THEN CAST(s.n_sketch AS DOUBLE)
                  ELSE 63.0 * 1152921504606846976.0 / CAST(s.kth_hash AS DOUBLE)
             END AS kmv_estimate,
             e.exact_distinct,
             abs(CASE WHEN s.n_sketch < 64 THEN CAST(s.n_sketch AS DOUBLE)
                      ELSE 63.0 * 1152921504606846976.0 / CAST(s.kth_hash AS DOUBLE)
                 END - CAST(e.exact_distinct AS DOUBLE))
               < CAST(e.exact_distinct AS DOUBLE) * 0.5 AS within_50pct
      FROM sketch s JOIN exact e USING (o_orderpriority)
      ORDER BY o_orderpriority
    """))

  // ---------------------------------------------------------------- q83
  // Priority sampling: 100 documents, inclusion ∝ n_chars, NO RNG —
  // priority = w·2⁶⁰/(h+1) from the row's own md5 hash. Deterministic
  // and append-stable like q44/q69's membership rules, but
  // weight-proportional; division-only (no ln/pow whose last-ulp
  // behavior differs across math libraries).
  private val q83 = Q(
    "q83_priority_sample",
    (s, dir) => {
      Sketch.prioritySample(Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id", "n_chars", n = 100)
        .orderBy(col("rnk"))
    },
    Some(s"""
      SELECT doc_id, source, n_chars, pri, CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT doc_id, source, n_chars, pri,
               ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id ASC) AS rnk
        FROM (
          SELECT doc_id, source, n_chars,
                 CAST(n_chars AS DOUBLE) * 1152921504606846976.0 /
                   CAST(${hashSql("doc_id")} + 1 AS DOUBLE) AS pri
          FROM documents))
      WHERE rnk <= 100
      ORDER BY rnk
    """))

  // ---------------------------------------------------------------- q89
  // KMV via the NATIVE aggregate (graft.functions.KmvSketchAgg):
  // distinct suppliers per return flag on lineitem — the largest table,
  // where the composed form's shuffle-every-distinct-pair cost shows.
  // The sketch partial-merges map-side (≤k longs per task·group reach
  // the exchange); same estimator, same oracle shape as q82.
  private val q89 = Q(
    "q89_kmv_native_agg",
    (s, dir) => {
      Sketch.kmvDistinctNative(Tables(s, dir, "lineitem"),
          "l_returnflag", "l_suppkey", k = 64)
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH hashed AS (
        SELECT DISTINCT l_returnflag, ${hashSql("l_suppkey")} AS h
        FROM lineitem),
      pruned AS (
        SELECT l_returnflag, h FROM (
          SELECT l_returnflag, h,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY h ASC) AS r
          FROM hashed)
        WHERE r <= 64),
      sketch AS (
        SELECT l_returnflag, COUNT(*) AS n_sketch, MAX(h) AS kth_hash
        FROM pruned GROUP BY l_returnflag),
      exact AS (
        SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS exact_distinct
        FROM lineitem GROUP BY l_returnflag)
      SELECT s.l_returnflag, s.n_sketch, s.kth_hash,
             CASE WHEN s.n_sketch < 64 THEN CAST(s.n_sketch AS DOUBLE)
                  ELSE 63.0 * 1152921504606846976.0 / CAST(s.kth_hash AS DOUBLE)
             END AS kmv_estimate,
             e.exact_distinct,
             abs(CASE WHEN s.n_sketch < 64 THEN CAST(s.n_sketch AS DOUBLE)
                      ELSE 63.0 * 1152921504606846976.0 / CAST(s.kth_hash AS DOUBLE)
                 END - CAST(e.exact_distinct AS DOUBLE))
               < CAST(e.exact_distinct AS DOUBLE) * 0.5 AS within_50pct
      FROM sketch s JOIN exact e USING (l_returnflag)
      ORDER BY l_returnflag
    """))

  // ---------------------------------------------------------------- q90
  // Count-min heavy hitters on the event stream: 4×1024 counter matrix
  // from the two md5 hash halves, exact top-10 users compared to their
  // CMS estimates. est ≥ exact is the CMS invariant (collisions only
  // inflate), surfaced as the `overestimates` column.
  private val q90 = Q(
    "q90_cms_heavy_hitters",
    (s, dir) => {
      Sketch.cmsHeavyHitters(Tables.events(s, dir).select(col("user_id")),
          "user_id", d = 4, w = 1024, topN = 10)
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH kh AS (
        SELECT user_id,
               ${hashSql("user_id")} AS kh1,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 15))::BIGINT AS kh2
        FROM events),
      cells AS (
        SELECT i, ((kh1 + i * kh2) % 1152921504606846976) % 1024 AS b,
               COUNT(*) AS c
        FROM kh, UNNEST(generate_series(0, 3)) t(i)
        GROUP BY i, b),
      exact AS (
        SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id),
      top AS (
        SELECT user_id, exact_cnt, rnk FROM (
          SELECT user_id, exact_cnt,
                 ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, user_id ASC) AS rnk
          FROM exact)
        WHERE rnk <= 10),
      probes AS (
        SELECT t.user_id, t.exact_cnt, t.rnk, u.i,
               ((k.kh1 + u.i * k.kh2) % 1152921504606846976) % 1024 AS b
        FROM top t
        JOIN (SELECT DISTINCT user_id, kh1, kh2 FROM kh) k USING (user_id),
             UNNEST(generate_series(0, 3)) u(i))
      SELECT p.user_id, p.exact_cnt, MIN(c.c) AS est_cnt,
             MIN(c.c) >= p.exact_cnt AS overestimates,
             CAST(p.rnk AS INTEGER) AS rnk
      FROM probes p JOIN cells c ON c.i = p.i AND c.b = p.b
      GROUP BY p.user_id, p.exact_cnt, p.rnk
      ORDER BY rnk
    """))

  private val normWordsSql =
    raw"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

  // --------------------------------------------------------------- q139
  // Cross-source overlap matrix from mergeable KMV sketches — the
  // sketch-algebra scale form of q128's exact matrix: per-source k-min
  // shingle hashes (native agg, ≤k longs per task·source cross the
  // exchange — the corpus-wide distinct-shingle exchange disappears),
  // pair union/Jaccard/intersection estimates as in-row arithmetic on
  // the k-member arrays. Pure md5 determinism, so the oracle
  // reproduces every ESTIMATE bit-for-bit (the q82 discipline);
  // SketchSpec pins the estimates against q128's exact values.
  private val q139 = Q(
    "q139_kmv_source_overlap",
    (s, dir) => Sketch.kmvSourceOverlap(Tables(s, dir, "documents"),
      "source", "text", shingleK = 3, k = 64),
    Some(raw"""
      WITH norm AS (
        SELECT source, $normWordsSql AS w FROM documents),
      sh AS (
        SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        FROM norm, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 3),
      hashed AS (
        SELECT DISTINCT source, ${hashSql("s")} AS h FROM sh),
      km AS (
        SELECT source, list(h ORDER BY h ASC) AS kv FROM (
          SELECT source, h,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS r
          FROM hashed)
        WHERE r <= 64
        GROUP BY source),
      pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, a.kv AS ka, b.kv AS kb
        FROM km a JOIN km b ON a.source < b.source),
      calc AS (
        SELECT src_a, src_b,
               CAST(len(u) AS BIGINT) AS nu,
               CAST(len(list_filter(u, x ->
                 list_contains(ka, x) AND list_contains(kb, x))) AS BIGINT)
                 AS rho,
               u[-1] AS kth
        FROM (
          SELECT src_a, src_b, ka, kb,
                 list_sort(list_distinct(list_concat(ka, kb)))[1:64] AS u
          FROM pairs)),
      f AS (
        SELECT src_a, src_b, nu AS n_union_sketch, rho AS rho_num,
               CAST(rho AS DOUBLE) / CAST(nu AS DOUBLE) AS jaccard_est,
               CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
                    ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)
               END AS union_est
        FROM calc)
      SELECT src_a, src_b, n_union_sketch, rho_num, jaccard_est, union_est,
             jaccard_est * union_est AS inter_est
      FROM f
      ORDER BY src_a, src_b
    """))

  // --------------------------------------------------------------- q161
  // O(new) KMV distinct-content ledger: per-source distinct-text
  // sketches maintained incrementally — history (doc_id % 3 > 0)
  // contributes ONLY its stored k-smallest-hash row, today's batch
  // folds map-side, and the two merge by pure array arithmetic (k
  // smallest of the union of two k-smallest sets = k smallest of the
  // united sets). The oracle recomputes the sketch from the FULL
  // corpus, so the hash match proves KMV mergeability end-to-end:
  // the daily path never rescans a historical member yet lands on
  // the identical sketch, kth hash, and estimate. The sketch family's
  // q65/q140-style incremental sibling (q82 is the batch form).
  private val q161 = Q(
    "q161_kmv_ledger_incremental",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val ledger = Sketch.kmvLedger(
        docs.filter(col("doc_id") % 3 > 0), "source", "text", k = 16)
      Sketch.kmvLedgerReport(
          Sketch.kmvLedgerMerge(ledger,
            docs.filter(col("doc_id") % 3 === 0), "source", "text", k = 16),
          "source", k = 16)
        .orderBy(col("source"))
    },
    Some(s"""
      WITH hashed AS (
        SELECT DISTINCT source, ${hashSql("text")} AS h FROM documents),
      pruned AS (
        SELECT source, h FROM (
          SELECT source, h,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY h ASC) AS r
          FROM hashed)
        WHERE r <= 16)
      SELECT source, COUNT(*) AS n_sketch, MAX(h) AS kth_hash,
             CASE WHEN COUNT(*) < 16 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE 15.0 * 1152921504606846976.0 / CAST(MAX(h) AS DOUBLE)
             END AS kmv_estimate
      FROM pruned GROUP BY source
      ORDER BY source
    """))

  def all: Seq[Q] = Seq(q82, q83, q89, q90, q139, q161)
}
