package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.{Chunking, Mixture, Sampling, TextAnalysis}

/** Training-data pipeline reshapes beyond the curation core: context
  * chunking, repetition flags, PII scrubbing, domain-mixture weights,
  * and the ranking-window function family. All per-row or single-shuffle
  * plans; every query has a bit-exact DuckDB twin.
  */
object PipelineQueries extends QueryPack {

  private val normWordsSql =
    raw"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

  // ---------------------------------------------------------------- q60
  // Context-window chunking: 64-token windows, stride 48 (16-token
  // overlap). Pure per-row reshape — sequence/posexplode/slice — so the
  // plan is scan-parallel with zero shuffle; the gate projects the
  // chunk's md5 so result rows stay small.
  private val q60 = Q(
    "q60_chunk_overlap",
    (s, dir) => {
      Chunking.chunkByTokens(Tables(s, dir, "documents"),
          "doc_id", "text", chunkTokens = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
          md5(col("chunk_text")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(raw"""
      WITH norm AS (
        SELECT doc_id, $normWordsSql AS w FROM documents),
      chunks AS (
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
               w[CAST(i*48+1 AS BIGINT) : CAST(least(i*48+64, len(w)) AS BIGINT)] AS cw
        FROM norm, UNNEST(generate_series(0,
          CAST(greatest(ceil((len(w)-64)/48.0), 0) AS BIGINT))) AS t(i)
        WHERE len(w) >= 1)
      SELECT doc_id, chunk_idx,
             CAST(len(cw) AS INTEGER) AS n_chunk_tokens,
             md5(array_to_string(cw, ' ')) AS chunk_fp
      FROM chunks
      ORDER BY doc_id, chunk_idx
    """))

  // ---------------------------------------------------------------- q61
  // Gopher-style repetition flags, all IN-ROW (zero shuffle): duplicate
  // word fraction and top-word fraction from array_distinct + a sorted
  // max-run fold — the shuffle-free complement of the exploded census
  // (q25). The oracle computes the identical quantities by exploding,
  // proving the in-row fold ≡ the group-by multiplicities.
  private val q61 = Q(
    "q61_repetition_flags",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.Dedup.words(col("text")).as("__w"))
      val (nWords, nDistinct, dupFrac, topFrac) =
        TextAnalysis.repetitionStats(col("__w"))
      docs.select(
          col("doc_id"),
          nWords.as("n_words"),
          nDistinct.as("n_distinct_words"),
          dupFrac.as("dup_word_frac"),
          topFrac.as("top_word_frac"),
          (topFrac > 0.2).as("flag_repetitive"))
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH norm AS (
        SELECT doc_id, $normWordsSql AS w FROM documents),
      counts AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM (SELECT doc_id, UNNEST(w) AS word FROM norm)
        GROUP BY doc_id, word),
      stats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
               CAST(MAX(c) AS BIGINT) AS top_count
        FROM counts GROUP BY doc_id)
      SELECT doc_id, n_words, n_distinct_words,
             1.0 - (CAST(n_distinct_words AS DOUBLE) /
                    CAST(greatest(n_words, 1) AS DOUBLE)) AS dup_word_frac,
             CAST(top_count AS DOUBLE) /
               CAST(greatest(n_words, 1) AS DOUBLE) AS top_word_frac,
             (CAST(top_count AS DOUBLE) /
               CAST(greatest(n_words, 1) AS DOUBLE)) > 0.2 AS flag_repetitive
      FROM stats
      ORDER BY doc_id
    """))

  // ---------------------------------------------------------------- q62
  // PII scrub: emails → <EMAIL>, URLs → <URL>, 3+-digit runs → <NUM>,
  // with per-class match counts taken on the ORIGINAL text. Patterns are
  // shared constants interpolated into the oracle so both engines run
  // the identical regex (ASCII-only, Java/RE2-dialect-neutral).
  private val q62 = Q(
    "q62_pii_scrub",
    (s, dir) => {
      val t = col("text")
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.piiCount(t, TextAnalysis.EmailRegex).as("n_email"),
          TextAnalysis.piiCount(t, TextAnalysis.UrlRegex).as("n_url"),
          TextAnalysis.piiCount(t, TextAnalysis.NumRunRegex).as("n_num"),
          md5(TextAnalysis.piiScrub(t)).as("scrub_fp"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRegex}')) AS INTEGER) AS n_email,
             CAST(len(regexp_extract_all(text, '${TextAnalysis.UrlRegex}')) AS INTEGER) AS n_url,
             CAST(len(regexp_extract_all(text, '${TextAnalysis.NumRunRegex}')) AS INTEGER) AS n_num,
             md5(regexp_replace(regexp_replace(regexp_replace(text,
               '${TextAnalysis.EmailRegex}', '<EMAIL>', 'g'),
               '${TextAnalysis.UrlRegex}', '<URL>', 'g'),
               '${TextAnalysis.NumRunRegex}', '<NUM>', 'g')) AS scrub_fp
      FROM documents
      ORDER BY doc_id
    """))

  // ---------------------------------------------------------------- q63
  // Domain-mixture weights toward a uniform target: one corpus-wide
  // hash aggregation, then window arithmetic over the few grouped rows
  // (single-reducer window is deliberate — groups stay small at any SF).
  private val q63 = Q(
    "q63_mixture_weights",
    (s, dir) => {
      Mixture.uniformMixtureWeights(Tables(s, dir, "documents"), "source")
        .orderBy(col("source"))
    },
    Some("""
      WITH s AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
      SELECT source, n_docs,
             CAST(n_docs AS DOUBLE) /
               CAST(SUM(n_docs) OVER () AS DOUBLE) AS actual_frac,
             (1.0 / CAST(COUNT(*) OVER () AS DOUBLE)) /
               (CAST(n_docs AS DOUBLE) /
                CAST(SUM(n_docs) OVER () AS DOUBLE)) AS weight
      FROM s
      ORDER BY source
    """))

  // ---------------------------------------------------------------- q64
  // Ranking-window family: ntile / percent_rank / cume_dist / lead /
  // first_value in one pass per segment — completes the window operator
  // surface next to q05 (row_number), q06 (lag) and q53 (range frame).
  // Unique tie-break (custkey) keeps cume_dist deterministic.
  private val q64 = Q(
    "q64_window_family",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(s, dir, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          lead(col("c_custkey"), 1).over(w).as("next_custkey"),
          first_value(col("c_custkey")).over(w).as("top_custkey"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
             PERCENT_RANK() OVER w AS pct_rank,
             CUME_DIST() OVER w AS cume,
             LEAD(c_custkey, 1) OVER w AS next_custkey,
             FIRST_VALUE(c_custkey) OVER w AS top_custkey
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC)
      ORDER BY c_mktsegment, c_custkey
    """))

  // ---------------------------------------------------------------- q67
  // Z-order (Morton) clustering key: bit-interleave of (custkey, order
  // day) — the layout that lets range-partitioned files prune on EITHER
  // dimension (Layout.writeZOrdered is the sink side; LayoutSpec proves
  // the per-file two-dimensional span bound). Pure bit arithmetic,
  // identical in both engines.
  private val q67 = Q(
    "q67_zorder_key",
    (s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), lit("2000-01-01").cast("date"))
            .as("day_nr"))
        .withColumn("zval",
          graft.operators.Layout.zValue(col("o_custkey"), col("day_nr")))
        .select(col("o_orderkey"), col("zval"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      SELECT o_orderkey,
             ${graft.operators.Layout.zValueSql("o_custkey",
               "date_diff('day', DATE '2000-01-01', o_orderdate)")} AS zval
      FROM orders
      ORDER BY o_orderkey
    """))

  // ---------------------------------------------------------------- q68
  // TF-IDF keywords per source: tf over (source, word), document
  // frequency over sources, idf = ln(n_sources/df), top-5 terms per
  // source. The corpus-distinct-source count fans back in as a ONE-row
  // broadcast cross join — an audited PlanAuditSpec exception (build
  // side is constant-size, cost linear in vocab; same class as q20/q36).
  private val q68 = Q(
    "q68_tfidf_keywords",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val words = docs.select(col("source"),
        explode(graft.operators.Dedup.words(col("text"))).as("word"))
      val tf = words.groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("word"))
        .agg(count(lit(1)).as("df"))
      val nsrc = docs.select(col("source")).distinct()
        .agg(count(lit(1)).as("nsrc"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("word").asc)
      tf.join(dfreq, "word")
        .crossJoin(broadcast(nsrc))
        .withColumn("score",
          round(col("tf").cast("double") *
            log(col("nsrc").cast("double") / col("df").cast("double")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("source"), col("word"), col("tf"), col("df"),
          col("score"), col("rnk"))
        .orderBy(col("source"), col("rnk"))
    },
    Some("""
      WITH words AS (
        SELECT source,
               UNNEST(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS word
        FROM documents),
      tf AS (SELECT source, word, COUNT(*) AS tf FROM words GROUP BY source, word),
      dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
      n AS (SELECT COUNT(DISTINCT source) AS nsrc FROM documents),
      scored AS (
        SELECT source, word, tf, df,
               ROUND(CAST(tf AS DOUBLE) *
                 ln(CAST(nsrc AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
        FROM tf JOIN dfreq USING (word) CROSS JOIN n),
      ranked AS (
        SELECT source, word, tf, df, score,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score DESC, word ASC) AS rnk
        FROM scored)
      SELECT source, word, tf, df, score, CAST(rnk AS INTEGER) AS rnk
      FROM ranked WHERE rnk <= 5
      ORDER BY source, rnk
    """))

  // ---------------------------------------------------------------- q69
  // Deterministic mixture downsample: q63's weights applied — keep a
  // doc iff its md5 uniform draw < min(1, weight). Membership is a pure
  // function of the id (append-stable, layout-invariant), so any engine
  // reproduces the exact subset; the oracle does.
  private val q69 = Q(
    "q69_mixture_downsample",
    (s, dir) => {
      Mixture.downsampleToMixture(Tables(s, dir, "documents"),
          "doc_id", "source")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH s AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      w AS (
        SELECT source,
               least(1.0,
                 (1.0 / CAST(COUNT(*) OVER () AS DOUBLE)) /
                 (CAST(n_docs AS DOUBLE) /
                  CAST(SUM(n_docs) OVER () AS DOUBLE))) AS frac
        FROM s)
      SELECT d.doc_id, d.source
      FROM documents d JOIN w USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
            < frac * 1152921504606846976.0
      ORDER BY d.doc_id
    """))

  // ---------------------------------------------------------------- q70
  // approx_percentile under the gate: q46's exact percentiles are the
  // small-scale baseline; the sketch (Greenwald-Khanna, bounded memory)
  // is what a 100 TB profile actually runs. Like q33's HLL, the sketch
  // value is not engine-portable, so the hashed columns are the exact
  // p50 plus a pinned-TRUE flag that the sketch landed within a fifth
  // of the exact p10–p90 spread.
  private val q70 = Q(
    "q70_approx_percentile",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("source"), TextAnalysis.tokenCount(col("text")).as("n"))
      toks.groupBy(col("source"))
        .agg(
          expr("percentile(n, array(0.1D, 0.5D, 0.9D))").as("__ex"),
          expr("approx_percentile(n, 0.5D, 1000)").as("__ap"))
        .select(col("source"),
          element_at(col("__ex"), 2).as("p50_exact"),
          (abs(col("__ap") - element_at(col("__ex"), 2)) <=
            (element_at(col("__ex"), 3) - element_at(col("__ex"), 1)) * 0.2 +
              lit(1e-9)).as("approx_ok"))
        .orderBy(col("source"))
    },
    Some(raw"""
      SELECT source, quantile_cont(n, 0.5) AS p50_exact, TRUE AS approx_ok
      FROM (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
        FROM documents)
      GROUP BY source
      ORDER BY source
    """))

  // --------------------------------------------------------------- q119
  // Length-bucketed batching: documents band by token length (16-wide
  // bins), fixed 8-doc batches form within each band in (n_tokens, id)
  // order, and each batch's padding waste (pad-to-batch-max) is
  // accounted. The banding is map-side and the only window partitions
  // by band — no corpus-wide sort. Gate output is the per-batch
  // padding ledger.
  private val q119 = Q(
    "q119_length_bucketed_batches",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.batchPaddingStats(
          Sampling.lengthBucketedBatches(toks, "doc_id", "n_tokens",
            bandTokens = 16, batchSize = 8), "n_tokens")
        .orderBy(col("band"), col("batch_idx"))
    },
    Some(raw"""
      WITH tok AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                 AS BIGINT) AS n_tokens
        FROM documents),
      b AS (SELECT doc_id, n_tokens, n_tokens // 16 AS band FROM tok),
      r AS (SELECT band, n_tokens,
                   row_number() OVER (PARTITION BY band
                                      ORDER BY n_tokens, doc_id) AS rn
            FROM b),
      g AS (SELECT band, (rn - 1) // 8 AS batch_idx, n_tokens FROM r)
      SELECT band, batch_idx, COUNT(*) AS n_docs,
             MAX(n_tokens) AS max_tokens,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             COUNT(*) * MAX(n_tokens) AS padded_tokens,
             COUNT(*) * MAX(n_tokens) - CAST(SUM(n_tokens) AS BIGINT)
               AS waste_tokens
      FROM g GROUP BY band, batch_idx ORDER BY band, batch_idx
    """))

  // --------------------------------------------------------------- q120
  // Token-balanced shards: every doc assigned to one of 8 shards with
  // near-equal token mass, deterministic md5 hash order (the q57
  // discipline), shard = the equal-span cut containing the doc's last
  // token — integer-exact, imbalance bounded by the largest document.
  // Gate output is the per-shard ledger.
  private val q120 = Q(
    "q120_token_balanced_shards",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.tokenBalancedShards(toks, "doc_id", "n_tokens", nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"))
        .orderBy(col("shard"))
    },
    Some(raw"""
      WITH tok AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                 AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                 ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                          doc_id ASC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM tok),
      t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM tok)
      SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM (
        SELECT CAST(((GREATEST(cum, 1) - 1) * 8) // GREATEST(total, 1) AS BIGINT)
                 AS shard,
               n_tokens
        FROM c CROSS JOIN t)
      GROUP BY shard ORDER BY shard
    """))

  // --------------------------------------------------------------- q141
  // Integrity manifest over the q120 shard assignment: per shard, doc
  // count, token mass, and an order-independent content checksum
  // (bit-XOR of 60-bit normalized-text fingerprints) — what a training
  // job re-derives from the files and compares before burning
  // cluster-hours on a corrupted export. XOR commutes, so the value is
  // partition/order-invariant; fingerprints compute map-side and the
  // shard exchange carries (shard, tokens, fp60) only.
  private val q141 = Q(
    "q141_shard_manifest",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.shardManifest(docs, "doc_id", "n_tokens", "text",
        nShards = 8)
    },
    Some(raw"""
      WITH tok AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                 AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(
                 regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT
                 AS fp60
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens, fp60,
               CAST(SUM(n_tokens) OVER (
                 ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                          doc_id ASC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM tok),
      t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM tok)
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(bit_xor(fp60) AS BIGINT) AS checksum
      FROM (
        SELECT CAST(((GREATEST(cum, 1) - 1) * 8) // GREATEST(total, 1) AS BIGINT)
                 AS shard,
               n_tokens, fp60
        FROM c CROSS JOIN t)
      GROUP BY shard ORDER BY shard
    """))

  // --------------------------------------------------------------- q129
  // Epoch materialization toward the uniform mixture — the upsampling
  // half q69 leaves to the training loader: floor(weight) repeats plus
  // one more iff the doc's md5 draw falls under frac(weight), so each
  // source's expected repetition is exactly its weight. The corpus is
  // SKEWED deterministically first (five sources keep only doc_id%4=0)
  // — on the uniform synthetic corpus every weight is 1.0 and the
  // operator would be exercised nowhere. Same double expression tree
  // as q63/q69 on both sides — bit-identical weights, exact integer
  // epochs.
  private val q129 = Q(
    "q129_mixture_epochs",
    (s, dir) => {
      val skewed = Tables(s, dir, "documents")
        .filter(!(col("source").isin("src0", "src1", "src2", "src3", "src4")
          && col("doc_id") % 4 =!= 0))
      Mixture.epochsToMixture(skewed, "doc_id", "source")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, source FROM documents
        WHERE NOT (source IN ('src0', 'src1', 'src2', 'src3', 'src4')
                   AND doc_id % 4 <> 0)),
      s AS (SELECT source, COUNT(*) AS n_docs FROM base GROUP BY source),
      w AS (
        SELECT source,
               (1.0 / CAST(COUNT(*) OVER () AS DOUBLE)) /
                 (CAST(n_docs AS DOUBLE) /
                  CAST(SUM(n_docs) OVER () AS DOUBLE)) AS weight
        FROM s)
      SELECT b.doc_id, b.source,
             CAST(floor(weight) AS BIGINT) +
             CASE WHEN CAST(('0x' ||
                 substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT
                 AS DOUBLE)
               < (weight - floor(weight)) * 1152921504606846976.0
               THEN 1 ELSE 0 END AS n_epochs
      FROM base b JOIN w USING (source)
      ORDER BY b.doc_id
    """))

  // --------------------------------------------------------------- q143
  // Temperature-scaled mixture factors at T=2 on the q129-skewed
  // corpus (uniform sources would put every factor at 1.0):
  // √(n_s/n_max) per source — the flattened sampling weight between
  // proportional and uniform, anchored to the largest component so no
  // order-dependent cross-source normalizing sum exists (sqrt and one
  // division are exact IEEE, hash-gateable; T≠2 would ride pow's
  // ~1-ulp portability caveat).
  private val q143 = Q(
    "q143_temperature_mixture",
    (s, dir) => {
      val skewed = Tables(s, dir, "documents")
        .filter(!(col("source").isin("src0", "src1", "src2", "src3", "src4")
          && col("doc_id") % 4 =!= 0))
      Mixture.temperatureFactors(skewed, "source")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, source FROM documents
        WHERE NOT (source IN ('src0', 'src1', 'src2', 'src3', 'src4')
                   AND doc_id % 4 <> 0)),
      s AS (SELECT source, COUNT(*) AS n_docs FROM base GROUP BY source)
      SELECT source, n_docs,
             ROUND(sqrt(CAST(n_docs AS DOUBLE) /
               (SELECT CAST(MAX(n_docs) AS DOUBLE) FROM s)), 6)
               AS temp_factor
      FROM s
      ORDER BY source
    """))

  // --------------------------------------------------------------- q131
  // Corpus datasheet: the one-row summary a dataset release ships —
  // doc/source/token/BPE-token totals, exact-dup mass, empty docs, max
  // and median length. One scan; every aggregate partial-combines, the
  // two exact COUNT(DISTINCT)s ride the Expand rewrite (×3 small-tuple
  // traffic — the price of exact dup mass in one pass; the two-pass
  // alternative is the q16 dedup ledger joined back). The median is
  // Spark `percentile` ≡ DuckDB `quantile_cont` (the q46-established
  // bitwise-portable pair); BPE totals ride the q113 native expression
  // and its generated oracle chain.
  private val q131 = Q(
    "q131_corpus_datasheet",
    (s, dir) =>
      graft.operators.Datasheet.summary(
        Tables(s, dir, "documents"), "source", "text"),
    Some(s"""
      WITH base AS (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS tok,
               ${graft.functions.BpeTokenizer.oracleCountFromSymbolsSql("s")}
                 AS btok,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                 AS fp,
               length(trim(text)) = 0 AS empty
        FROM (SELECT source, text,
                ${graft.functions.BpeTokenizer.oracleSymbolStreamSql("text")}
                  AS s
              FROM documents))
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(tok) AS BIGINT) AS n_tokens,
             CAST(SUM(btok) AS BIGINT) AS n_bpe_tokens,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_fps,
             CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dup_docs,
             CAST(SUM(CASE WHEN empty THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty_docs,
             CAST(MAX(tok) AS BIGINT) AS max_tokens,
             quantile_cont(tok, 0.5) AS p50_tokens
      FROM base
    """))

  // --------------------------------------------------------------- q132
  // O(new) incremental datasheet: yesterday's stored summary + source
  // census + token-length histogram census + fingerprint ledger,
  // today's batch — history text is never rescanned and ledger
  // fingerprints never cross an exchange (the q116 bloom-gated core
  // decides novelty). The exact median is replaced by the HISTOGRAM
  // median over the merged per-bin census (exactly mergeable state —
  // unlike a percentile sketch binary — and within one bin width of
  // the exact p50, DatasheetSpec-pinned); the oracle recomputes the
  // identical integer histogram rule over the FULL table, so the hash
  // match proves the census merge is exact, the q65/q108/q116/q122
  // family discipline.
  private val q132 = Q(
    "q132_incremental_datasheet",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val history = docs.filter(col("doc_id") % 3 === 0)
      val batch = docs.filter(col("doc_id") % 3 =!= 0)
      graft.operators.Datasheet.incremental(
        graft.operators.Datasheet.summary(history, "source", "text"),
        history.select(col("source")),
        graft.operators.Datasheet.tokenHistogram(history, "text"),
        history.select(
          graft.operators.Dedup.fingerprint(col("text")).as("fp")),
        batch, "source", "text", expectedItems = 1L << 16)
    },
    Some(s"""
      WITH base AS (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS tok,
               ${graft.functions.BpeTokenizer.oracleCountFromSymbolsSql("s")}
                 AS btok,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                 AS fp,
               length(trim(text)) = 0 AS empty
        FROM (SELECT source, text,
                ${graft.functions.BpeTokenizer.oracleSymbolStreamSql("text")}
                  AS s
              FROM documents)),
      hist AS (
        SELECT LEAST(tok // 16, 256) AS bin, COUNT(*) AS cnt
        FROM base GROUP BY 1),
      med AS (
        SELECT CAST(MIN(bin) * 16 AS BIGINT) AS p50_tokens_hist_lo
        FROM (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum,
                     SUM(cnt) OVER () AS n
              FROM hist)
        WHERE cum >= (n + 1) // 2)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(tok) AS BIGINT) AS n_tokens,
             CAST(SUM(btok) AS BIGINT) AS n_bpe_tokens,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_fps,
             CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dup_docs,
             CAST(SUM(CASE WHEN empty THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty_docs,
             CAST(MAX(tok) AS BIGINT) AS max_tokens,
             (SELECT p50_tokens_hist_lo FROM med) AS p50_tokens_hist_lo
      FROM base
    """))

  // --------------------------------------------------------------- q148
  // Equi-depth curriculum deciles: every document's global rank under
  // (n_tokens ASC, doc_id ASC) maps to bucket = (rank−1)·10 DIV n —
  // equal-count bins however skewed the length distribution, the cut a
  // length-ordered curriculum or a score-calibration step consumes.
  // The rank is the q45/q57/q120 distributed prefix sum with the score
  // itself as the range key (monotone in the order, so no sampling
  // pass, no corpus-wide sort, no single-partition window); bucket
  // arithmetic is integer-exact, hence portable to the oracle's
  // ROW_NUMBER formulation bit-for-bit.
  private val q148 = Q(
    "q148_equi_depth_deciles",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.equiDepthBuckets(toks, "doc_id", "n_tokens", k = 10)
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH tok AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                 AS BIGINT) AS n_tokens
        FROM documents)
      SELECT doc_id, n_tokens,
             CAST((rn - 1) * 10 // n AS BIGINT) AS bucket
      FROM (SELECT doc_id, n_tokens,
                   ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM tok)
      ORDER BY doc_id
    """))

  // --------------------------------------------------------------- q155
  // Token-length distribution drift between two corpus slices (first
  // ten sources vs the rest) — the PSI audit in exact integers: per
  // bin, both counts plus a drifted flag where the bin share differs
  // by more than 3/2 in either direction, decided by DECIMAL(38,0)
  // cross-multiplication (no division/float/log, bit-portable; the
  // oracle uses HUGEINT for the same products). Census rows are
  // <= numBins+1 whatever the corpus size.
  private val q155 = Q(
    "q155_histogram_drift",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val inA = col("source").isin(
        (0 until 10).map(i => s"src$i"): _*)
      graft.operators.Datasheet.histogramDrift(
          docs.filter(inA), docs.filter(!inA), "text",
          binWidth = 8L, numBins = 256, ratioNum = 3L, ratioDen = 2L)
        .orderBy(col("bin"))
    },
    Some(raw"""
      WITH toks AS (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END AS tok
        FROM documents),
      ha AS (
        SELECT LEAST(tok // 8, 256) AS bin, COUNT(*) AS cnt_a FROM toks
        WHERE source IN ('src0','src1','src2','src3','src4',
                         'src5','src6','src7','src8','src9')
        GROUP BY 1),
      hb AS (
        SELECT LEAST(tok // 8, 256) AS bin, COUNT(*) AS cnt_b FROM toks
        WHERE source NOT IN ('src0','src1','src2','src3','src4',
                             'src5','src6','src7','src8','src9')
        GROUP BY 1),
      j AS (
        SELECT COALESCE(ha.bin, hb.bin) AS bin,
               COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin),
      t AS (SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b FROM j)
      SELECT bin, CAST(cnt_a AS BIGINT) AS cnt_a,
             CAST(cnt_b AS BIGINT) AS cnt_b,
             (cnt_a::HUGEINT * tot_b * 2 > cnt_b::HUGEINT * tot_a * 3
              OR cnt_b::HUGEINT * tot_a * 2 > cnt_a::HUGEINT * tot_b * 3)
               AS drifted
      FROM j, t
      ORDER BY bin
    """))

  def all: Seq[Q] = Seq(q60, q61, q62, q63, q64, q67, q68, q69, q70, q119,
    q120, q129, q131, q132, q141, q143, q148, q155)
}
