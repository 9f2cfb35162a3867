package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.streaming.StreamingOps

/** Streaming + stateful ops under the oracle gate. q29 sessionizes with
  * the flatMapGroupsWithState operator (batch invocation — identical
  * code path runs on a stream); q30 runs a real Structured Streaming
  * query (file source → watermark → windowed agg → memory sink) and is
  * checked against the same SQL as the batch windowed agg — streaming/
  * batch parity is the assertion.
  */
object StreamingQueries extends QueryPack {

  // ---------------------------------------------------------------- q29
  // Gap sessionization (30-min). The BATCH entry point is the window
  // plan (sessionizeBatch) — lag + running sum, no per-group buffering,
  // hot keys spill instead of OOM. The keyed-state streaming form
  // (sessionize) is asserted equal in SessionizeParitySpec.
  private val q29 = Q(
    "q29_sessionize",
    (s, dir) => {
      import s.implicits._
      val evs = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .as[StreamingOps.Ev]
      StreamingOps.sessionizeBatch(evs, gapMicros = 1800L * 1000000L)
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM (
          SELECT user_id, event_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev_ts
          FROM events))
      ORDER BY user_id, event_id
    """))

  // ---------------------------------------------------------------- q30
  // Structured Streaming hourly windows (1h watermark, AvailableNow,
  // complete mode) — must equal the batch time-bucket aggregation.
  private val q30 = Q(
    "q30_stream_hourly",
    (s, dir) => {
      StreamingOps.hourlyAggAvailableNow(s, dir, "q30_stream_hourly_sink")
        .orderBy(col("bucket_start"), col("event_type"))
    },
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket_start, event_type
    """))

  // ---------------------------------------------------------------- q38
  // As-of join (log-enrichment shape): each error event picks up the
  // most recent click value at-or-before it, per user — composed as one
  // union+window pass (operators.AsOfJoin), no range join, one shuffle.
  private val q38 = Q(
    "q38_asof_join",
    (s, dir) => {
      val events = Tables.events(s, dir)
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.asOf(errors, clicks,
          keyCol = "user_id", tsCol = "ts", valueCol = "value",
          tieCol = "event_id")
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, ts, event_id, value, asof_value, asof_ts FROM (
        SELECT user_id, ts, event_id, value, side,
               last_value(rv IGNORE NULLS) OVER w AS asof_value,
               last_value(rts IGNORE NULLS) OVER w AS asof_ts
        FROM (
          SELECT user_id, ts, event_id, value, 1 AS side,
                 CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS TIMESTAMP) AS rts
          FROM events WHERE event_type = 'error'
          UNION ALL
          SELECT user_id, ts, event_id, NULL, 0, value, ts
          FROM events WHERE event_type = 'click')
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC, side ASC, event_id ASC
                     ROWS UNBOUNDED PRECEDING))
      WHERE side = 1
      ORDER BY user_id, event_id
    """))

  // ---------------------------------------------------------------- q49
  // Stream-stream interval join (errors ⋈ same-user clicks within the
  // preceding hour), drained with AvailableNow — watermarks on both
  // sides + a two-sided time bound keep state finite; inner joins emit
  // on match, so the drain equals the batch interval join the oracle
  // computes.
  private val q49 = Q(
    "q49_stream_stream_join",
    (s, dir) => {
      StreamingOps.clickErrorJoinAvailableNow(s, dir, "q49_ssj_sink")
        .orderBy(col("user_id"), col("err_id"), col("click_id"))
    },
    Some("""
      SELECT e.user_id, e.event_id AS err_id, e.ts AS err_ts,
             c.event_id AS click_id, c.value AS click_value
      FROM events e JOIN events c
        ON e.user_id = c.user_id
       AND e.event_type = 'error' AND c.event_type = 'click'
       AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
      ORDER BY e.user_id, err_id, click_id
    """))

  // ---------------------------------------------------------------- q86
  // Stream-static enrich: the reference's chart×episode join with the
  // fact side streaming — static nation dim broadcast into each
  // micro-batch (no state, no dim shuffle), complete-mode aggregate,
  // AvailableNow drain ≡ the batch join+agg the oracle computes.
  private val q86 = Q(
    "q86_stream_static_enrich",
    (s, dir) => {
      StreamingOps.streamStaticEnrichAvailableNow(s, dir,
          "q86_stream_static_sink")
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n.n_name, COUNT(*) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events e LEFT JOIN nation n ON e.user_id % 25 = n.n_nationkey
      GROUP BY n.n_name
      ORDER BY n.n_name
    """))

  // ---------------------------------------------------------------- q96
  // q38's as-of join through the CUSTOM WHOLE-OPERATOR path:
  // AsOfJoinNode (logical) → AsOfJoinStrategy (planner) →
  // BroadcastAsOfJoinExec (physical). The right side broadcasts as
  // per-key ts-sorted arrays; the fact side is probed by binary search
  // with ZERO shuffle/sort (q38's composed form exchanges + sorts both
  // sides). The operator installs its strategy on the live session at
  // build time, so the driver's extension-free session still plans it.
  // Timestamps ride as epoch micros (BIGINT), the suite convention.
  private val q96 = Q(
    "q96_asof_custom_operator",
    (s, dir) => {
      val events = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("value"))
      graft.operators.AsOfJoin.broadcastAsOf(errors, clicks,
          keyCol = "user_id", tsCol = "ts_us", valueCol = "value")
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      WITH errors AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        FROM events WHERE event_type = 'error'),
      clicks AS (
        SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, epoch_us(ts))
      SELECT user_id, ts_us, event_id, value, asof_ts, asof_value FROM (
        SELECT user_id, ts_us, event_id, value, side,
               last_value(rts IGNORE NULLS) OVER w AS asof_ts,
               last_value(rv IGNORE NULLS) OVER w AS asof_value
        FROM (
          SELECT user_id, ts_us, event_id, value, 1 AS side,
                 CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS BIGINT) AS rts
          FROM errors
          UNION ALL
          SELECT user_id, ts_us, NULL, NULL, 0, value, ts_us FROM clicks)
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts_us ASC, side ASC, event_id ASC
                     ROWS UNBOUNDED PRECEDING))
      WHERE side = 1
      ORDER BY user_id, event_id
    """))

  // ---------------------------------------------------------------- q99
  // Streaming dedup under the gate: the file source replays the whole
  // events table twice (double symlink), keyed dropDuplicates reduces
  // the doubled stream back to the base table. Duplicates are
  // bit-identical, so the drain is order-insensitive and the oracle is
  // plain SELECT over events. Production uses the watermark-bounded
  // dropDuplicatesWithinWatermark (StreamingOpsSpec).
  private val q99 = Q(
    "q99_stream_dedup",
    (s, dir) => {
      StreamingOps.streamDedupAvailableNow(s, dir, "q99_dedup_sink")
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, event_type, value
      FROM events
      ORDER BY event_id
    """))

  // --------------------------------------------------------------- q103
  // Stream-stream LEFT OUTER interval join: unmatched errors surface
  // with null click columns once the watermark closes their window
  // (the final no-data micro-batch flushes them). The probe side is
  // clipped 3 days before the data's end so every retained error's
  // window is provably closed by the final watermark — inside the clip
  // the drain is deterministic and equals the batch LEFT JOIN; q49
  // stays the inner-join twin.
  private val q103 = Q(
    "q103_stream_outer_join",
    (s, dir) => {
      StreamingOps.clickErrorLeftJoinAvailableNow(s, dir,
          "q103_ssjo_sink", endExclusive = "2024-01-28 00:00:00")
        .orderBy(col("user_id"), col("err_id"), col("click_id"))
    },
    Some("""
      SELECT e.user_id, e.event_id AS err_id, e.ts AS err_ts,
             c.event_id AS click_id, c.value AS click_value
      FROM events e LEFT JOIN events c
        ON e.user_id = c.user_id
       AND c.event_type = 'click'
       AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
      WHERE e.event_type = 'error'
        AND e.ts < TIMESTAMP '2024-01-28 00:00:00'
      ORDER BY e.user_id, err_id, click_id
    """))

  // --------------------------------------------------------------- q105
  // The flatMapGroupsWithState session state machine AS A STREAM under
  // the gate: keyed state assigns gap sessions per user, append drain ≡
  // the q29 window plan the oracle computes (same gap, same ordering).
  // q29 gates the batch formulation; this gates the custom-state
  // streaming one.
  private val q105 = Q(
    "q105_stream_sessionize",
    (s, dir) => {
      StreamingOps.sessionizeStreamAvailableNow(s, dir,
          "q105_sess_sink", gapMicros = 1800L * 1000000L)
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM (
          SELECT user_id, event_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev_ts
          FROM events))
      ORDER BY user_id, event_id
    """))

  // --------------------------------------------------------------- q145
  // Streaming novelty gate: arriving document files anti-join a STATIC
  // history fingerprint ledger — the streaming form of the q65/q116
  // incremental-dedup family (continuous ingest instead of a daily
  // batch diff). Stateless per row (novelty vs history needs no state
  // store), append mode; history contributes only distinct
  // fingerprints. The oracle is the plain batch NOT-IN over the same
  // %3 split.
  private val q145 = Q(
    "q145_stream_novelty_gate",
    (s, dir) => {
      StreamingOps.streamNovelDocs(s, dir, "q145_novel_sink")
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH hist AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 3 > 0),
      batch AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 3 = 0)
      SELECT doc_id, fp FROM batch
      WHERE fp NOT IN (SELECT fp FROM hist)
      ORDER BY doc_id
    """))

  // --------------------------------------------------------------- q146
  // First-arrival novelty gate: q145 plus intra-stream dedup —
  // dropDuplicatesWithinWatermark on the fingerprint (state-store
  // backed, watermark-bounded) collapses same-stream duplicate content
  // to ONE emission BEFORE the stateless anti join against history.
  // The gate emits fingerprints only, so which same-fp copy won the
  // state race is invisible and the drain is deterministic; the oracle
  // is the batch DISTINCT-novel-fps query. Cross-batch state carry is
  // spec-proven with a two-batch MemoryStream (StreamingOpsSpec).
  private val q146 = Q(
    "q146_stream_novelty_first_arrival",
    (s, dir) => {
      StreamingOps.streamNovelFirstArrival(s, dir, "q146_novel_fa_sink")
        .orderBy(col("fp"))
    },
    Some(raw"""
      WITH hist AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 3 > 0),
      batch AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 3 = 0)
      SELECT fp FROM batch
      WHERE fp NOT IN (SELECT fp FROM hist)
      ORDER BY fp
    """))

  // --------------------------------------------------------------- q165
  // Streaming corpus health monitor: per (event-time window, source),
  // arriving docs fold to doc/token/char counts and an empty-doc tally
  // — the live dashboard feed of a continuously-ingesting pipeline,
  // and the streaming restatement of the q131 datasheet's structural
  // metrics. All sums are exact integers, so the AvailableNow drain
  // hash-gates against the batch recompute; event time is the
  // deterministic 1-doc-per-second pseudo ingest clock (q146's
  // discipline), which makes the 60 s window a doc_id DIV 60 group the
  // oracle replays literally.
  private val q165 = Q(
    "q165_stream_corpus_health",
    (s, dir) => {
      StreamingOps.corpusHealthStream(s, dir, "q165_health_sink")
        .orderBy(col("bucket_start"), col("source"))
    },
    Some(raw"""
      WITH f AS (
        SELECT source,
               epoch_ms((1704067200 + (doc_id // 60) * 60) * 1000)
                 AS bucket_start,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END AS n_tokens,
               length(text) AS n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END
                 AS is_empty
        FROM documents)
      SELECT bucket_start, source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(SUM(is_empty) AS BIGINT) AS n_empty
      FROM f GROUP BY bucket_start, source
      ORDER BY bucket_start, source
    """))

  // --------------------------------------------------------------- q188
  // Streaming decontamination gate: q72's n-gram benchmark check
  // applied IN-FLIGHT — arriving docs probe the static benchmark
  // shingle set (stream-static broadcast join, stateless) and only
  // contaminated docs emit with their distinct-hit count. Shingles
  // dedup IN-ROW (array_distinct before explode) because a streaming
  // distinct would be unbounded state and count_distinct is
  // unsupported in streams; the Complete-mode AvailableNow drain
  // re-emits the final count table, which the batch oracle replays.
  private val q188 = Q(
    "q188_stream_decontam_gate",
    (s, dir) => {
      StreamingOps.streamDecontamGate(s, dir, "q188_decontam_sink")
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH norm AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        FROM norm, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 3),
      bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 25 = 0)
      SELECT c.doc_id, COUNT(*) AS hit_ngrams
      FROM sh c JOIN bench USING (s)
      WHERE c.doc_id % 3 = 0 AND c.doc_id % 25 <> 0
      GROUP BY c.doc_id
      ORDER BY doc_id
    """))

  // --------------------------------------------------------------- q215
  // Streaming frame-retread gate — the first streaming consumer of the
  // multimodal column: arriving documents cut into 64-byte BINARY
  // frames IN-ROW (sampleFrames is pure column expressions, so it
  // streams unchanged), each frame's digest probes the static
  // history-frame digest set (stream-static broadcast join), and only
  // RETREADS emit — the "this upload is stock footage" alert feed a
  // pipeline tails before paying to store an arriving payload.
  // Stateless Append (per-frame verdict against stored history — no
  // within-stream election, no state store); the payload projects to
  // a digest before the join, the q210 discipline. Oracle = the batch
  // recompute of the arriving slice's retread frames.
  private val q215 = Q(
    "q215_stream_frame_gate",
    (s, dir) => {
      StreamingOps.streamFrameGate(s, dir, "q215_frame_gate_sink")
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""
      WITH fr AS (
        SELECT doc_id, i, md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM documents,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i))),
      led AS (SELECT DISTINCT dg FROM fr WHERE doc_id % 3 <> 0)
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, dg AS frame_digest
      FROM fr
      WHERE doc_id % 3 = 0 AND dg IN (SELECT dg FROM led)
      ORDER BY doc_id, frame_idx
    """))

  // --------------------------------------------------------------- q246
  // Streaming snippet gate — q244's best-window election IN-FLIGHT
  // and IN-ROW: an arriving document computes its own best query-term
  // window entirely inside the row (hit positions, anchored counts,
  // the (max hits, earliest start) argmax — higher-order array
  // functions), so the stream plan is a stateless Append projection +
  // filter: no state store, no shuffle, not even the batch form's
  // per-doc window exchange. No global topN in-flight (a
  // cross-document rank would need state — q244 ranks at rest); each
  // emitted row is exactly the batch election's row for that doc,
  // which is what the oracle pins.
  private val q246 = Q(
    "q246_stream_snippet",
    (s, dir) => {
      StreamingOps.streamBestSnippet(s, dir, "q246_snippet_sink")
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH words AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents
        WHERE doc_id % 3 = 0),
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
        WHERE rn = 1)
      SELECT b.doc_id, CAST(b.start_pos AS BIGINT) AS start_pos,
             CAST(b.n_hits AS BIGINT) AS n_hits,
             array_to_string(w[b.start_pos + 1:b.start_pos + 8], ' ')
               AS snippet
      FROM best b JOIN words USING (doc_id)
      ORDER BY b.doc_id
    """))

  def all: Seq[Q] = Seq(q29, q30, q38, q49, q86, q96, q99, q103, q105,
    q145, q146, q165, q188, q215, q246)
}
