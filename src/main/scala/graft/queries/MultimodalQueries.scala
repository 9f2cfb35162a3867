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

  // ---------------------------------------------------------------- q206
  // Frame sampling under the gate: payloads cut into 64-byte frames,
  // every 2nd frame kept — the binary-slicing shape of video frame
  // extraction (substring on BINARY), verified byte-exact: the corpus
  // is pure ASCII, so DuckDB's text substring slices the same bytes
  // and the per-frame md5 digests must match. Empty payloads emit no
  // frames on either side (the clamped-sequence phantom-frame case
  // the operator guards).
  private val q206 = Q(
    "q206_multimodal_frames",
    (s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.withPayload(Tables(s, dir, "documents"),
            "doc_id", "text"),
          "doc_id", frameSize = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
          md5(col("frame")).as("frame_digest"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(octet_length(encode(f)) AS BIGINT) AS frame_bytes,
             md5(f) AS frame_digest
      FROM (
        SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
        FROM documents,
             UNNEST(generate_series(0,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
               t(i))
      WHERE i % 2 = 0
      ORDER BY doc_id, frame_idx
    """))

  // ---------------------------------------------------------------- q210
  // Frame-level exact dedup — ParaDedup's keep-first discipline on
  // BINARY frames, the multimodal column's first connection to the
  // dedup stack: every 64-byte frame (stride 1 — dedup sees all of
  // them) elects by digest keep-first (first occurrence corpus-wide
  // by (doc_id, frame_idx) wins), and the census reports per doc how
  // many frames are retreads and how many bytes dedup reclaims. The
  // payload never crosses the exchange (rows project to digests
  // before the election window). The oracle replays the frame cut,
  // the ROW_NUMBER election, and the census; the testdata carries
  // real duplicate frames (103 retread occurrences at sf0.01), so
  // the mass columns are live, not vacuously zero.
  private val q210 = Q(
    "q210_frame_dedup_census",
    (s, dir) => {
      Multimodal.frameDupCensus(
          Multimodal.dedupFrames(
            Multimodal.sampleFrames(
              Multimodal.withPayload(Tables(s, dir, "documents"),
                "doc_id", "text"),
              "doc_id", frameSize = 64, stride = 1),
            "doc_id"),
          "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH fr AS (
        SELECT doc_id, i,
               CAST(octet_length(encode(f)) AS BIGINT) AS fb,
               md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM documents,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i))),
      el AS (
        SELECT doc_id, i, fb,
               ROW_NUMBER() OVER (PARTITION BY dg
                 ORDER BY doc_id ASC, i ASC) AS rn
        FROM fr)
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_frames,
             CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_frames,
             CAST(SUM(CASE WHEN rn > 1 THEN fb ELSE 0 END) AS BIGINT)
               AS dup_bytes
      FROM el GROUP BY doc_id
      ORDER BY doc_id
    """))

  // ---------------------------------------------------------------- q213
  // The frame-digest LEDGER + its O(new) merge — q210's election state
  // made storable (the q192 discipline on the media axis): history
  // (doc_id % 3 = 1) builds a per-digest (first_doc, first_idx, n_occ)
  // ledger, day 1 (doc_id % 3 = 2) absorbs by MIN on the coordinate —
  // (doc, idx) pairs form a semilattice under least, so the merge is
  // exact whatever the batch cut — and ADD on the count; history
  // frames are never re-read. Output: the duplicate-provenance report
  // (digests seen ≥ 2 times, where each first appeared — the "which
  // intro card is this" read). Oracle = the full recompute over
  // history ∪ day 1.
  private val q213 = Q(
    "q213_frame_ledger_merge",
    (s, dir) => {
      def frames(p: Int) = Multimodal.sampleFrames(
        Multimodal.withPayload(
          Tables(s, dir, "documents").filter(col("doc_id") % 3 === p),
          "doc_id", "text"),
        "doc_id", frameSize = 64, stride = 1)
      Multimodal.mergeFrameLedger(
          Multimodal.frameLedger(frames(1), "doc_id"),
          Multimodal.frameLedger(frames(2), "doc_id"))
        .filter(col("n_occ") > 1)
        .orderBy(col("frame_digest"))
    },
    Some("""
      WITH fr AS (
        SELECT doc_id, i, md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM documents,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i)
          WHERE doc_id % 3 <> 0)),
      fst AS (
        SELECT dg, doc_id, i,
               ROW_NUMBER() OVER (PARTITION BY dg
                 ORDER BY doc_id ASC, i ASC) AS rn
        FROM fr),
      agg AS (SELECT dg, COUNT(*) AS n FROM fr GROUP BY dg)
      SELECT f.dg AS frame_digest,
             CAST(f.doc_id AS BIGINT) AS first_doc,
             CAST(f.i AS INTEGER) AS first_idx,
             CAST(a.n AS BIGINT) AS n_occ
      FROM fst f JOIN agg a USING (dg)
      WHERE f.rn = 1 AND a.n > 1
      ORDER BY f.dg
    """))

  // ---------------------------------------------------------------- q214
  // Day-2 frame NOVELTY census against the merged ledger — the O(new)
  // daily read: a day-2 (doc_id % 3 = 0) frame is a retread iff its
  // digest sits in the stored ledger (ARRIVAL-order keep-first: the
  // copy already ledgered wins, whatever its id — the incremental
  // semantics, distinct from q210's whole-corpus (doc, idx) election)
  // or an earlier day-2 frame already carries it. The day's distinct
  // digest set broadcasts into a semi-join on the ledger; history
  // never shuffles whole. Oracle replays the membership + in-day
  // election; testdata carries cross-slice duplicate frames, so the
  // retread columns are live.
  private val q214 = Q(
    "q214_frame_novelty_census",
    (s, dir) => {
      def frames(where: org.apache.spark.sql.Column) =
        Multimodal.sampleFrames(
          Multimodal.withPayload(
            Tables(s, dir, "documents").filter(where),
            "doc_id", "text"),
          "doc_id", frameSize = 64, stride = 1)
      val merged = Multimodal.mergeFrameLedger(
        Multimodal.frameLedger(frames(col("doc_id") % 3 === 1), "doc_id"),
        Multimodal.frameLedger(frames(col("doc_id") % 3 === 2), "doc_id"))
      Multimodal.frameDupCensus(
          Multimodal.dedupFramesAgainstLedger(merged,
            frames(col("doc_id") % 3 === 0), "doc_id"),
          "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH fr AS (
        SELECT doc_id, i,
               CAST(octet_length(encode(f)) AS BIGINT) AS fb,
               md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM documents,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i))),
      led AS (SELECT DISTINCT dg FROM fr WHERE doc_id % 3 <> 0),
      d2 AS (SELECT * FROM fr WHERE doc_id % 3 = 0),
      el AS (
        SELECT doc_id, fb,
               (dg NOT IN (SELECT dg FROM led)
                AND ROW_NUMBER() OVER (PARTITION BY dg
                      ORDER BY doc_id ASC, i ASC) = 1) AS keep
        FROM d2)
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_frames,
             CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dup_frames,
             CAST(SUM(CASE WHEN keep THEN 0 ELSE fb END) AS BIGINT)
               AS dup_bytes
      FROM el GROUP BY doc_id
      ORDER BY doc_id
    """))

  // ---------------------------------------------------------------- q223
  // The MEDIA curation pipeline — the q191 composition discipline on
  // the multimodal axis, and the first query where the media column
  // flows through dedup AND curation under one hash gate: frames cut
  // (stride 1) → whole-corpus keep-first election (q210) → per-doc
  // census with KEPT byte mass → retread gate (docs whose duplicate
  // share exceeds 300‰ drop — stock-footage re-uploads) → per-KIND
  // byte budget (the q159 admission machinery fed bytes for tokens:
  // within image/audio/video, docs admit largest-unique-first until
  // the kind's 25 000-byte budget crosses — mid-distribution at
  // sf0.01, so both verdict branches are live) → per-doc accounting.
  // Integer arithmetic throughout (permille gate, byte sums).
  private val q223 = Q(
    "q223_media_curation_pipeline",
    (s, dir) => {
      val census = Multimodal.mediaCurationCensus(
        Multimodal.dedupFrames(
          Multimodal.sampleFrames(
            Multimodal.withPayload(Tables(s, dir, "documents"),
              "doc_id", "text"),
            "doc_id", frameSize = 64, stride = 1),
          "doc_id"),
        "doc_id")
      val gated = census
        .filter(col("n_dup_frames") * 1000 <= col("n_frames") * 300)
        .withColumn("kind",
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video"))
      graft.operators.Curation.hostTokenBudget(gated, "kind", "doc_id",
          "kept_bytes", "kept_bytes", budgetTokens = 25000L)
        .select(col("doc_id"), col("kind"), col("n_frames"),
          col("n_dup_frames"), col("kept_bytes"),
          col("cum_tokens").as("cum_bytes"), col("kept"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH fr AS (
        SELECT doc_id, i,
               CAST(octet_length(encode(f)) AS BIGINT) AS fb,
               md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM documents,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i))),
      el AS (
        SELECT doc_id, i, fb,
               ROW_NUMBER() OVER (PARTITION BY dg
                 ORDER BY doc_id ASC, i ASC) AS rn
        FROM fr),
      cen AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_frames,
               CAST(SUM(CASE WHEN rn = 1 THEN fb ELSE 0 END) AS BIGINT)
                 AS kept_bytes
        FROM el GROUP BY doc_id),
      g AS (
        SELECT *,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind
        FROM cen
        WHERE n_dup_frames * 1000 <= n_frames * 300),
      cum AS (
        SELECT doc_id, kind, n_frames, n_dup_frames, kept_bytes,
               SUM(kept_bytes) OVER (PARTITION BY kind
                 ORDER BY kept_bytes DESC, doc_id ASC
                 ROWS UNBOUNDED PRECEDING) AS cum_bytes
        FROM g)
      SELECT doc_id, kind, n_frames, n_dup_frames, kept_bytes,
             CAST(cum_bytes AS BIGINT) AS cum_bytes,
             cum_bytes <= 25000 AS kept
      FROM cum ORDER BY doc_id
    """))

  // ---------------------------------------------------------------- q224
  // Frame-ledger DELETE — the deletion discipline the min-semilattice
  // forces, distinct from the additive ledgers' subtraction (q211/
  // q212): a MIN cannot un-merge (the evicted doc may BE the first
  // occurrence and the runner-up is not in the aggregate), so digests
  // touched by the deleted docs RE-ELECT from the stored occurrence
  // index — the q183 affected-group rule, O(affected occurrences),
  // never a corpus re-scan — while untouched rows pass through. With
  // q213 (append) this closes the frame ledger's lifecycle; the
  // oracle recomputes the ledger over the surviving docs. Output: the
  // post-delete duplicate-provenance report (n_occ > 1).
  private val q224 = Q(
    "q224_frame_ledger_purge",
    (s, dir) => {
      val frames = Multimodal.sampleFrames(
        Multimodal.withPayload(Tables(s, dir, "documents"),
          "doc_id", "text"),
        "doc_id", frameSize = 64, stride = 1)
      val ledger = Multimodal.frameLedger(frames, "doc_id")
      val occ = Multimodal.frameOccurrences(frames, "doc_id")
      val deleted = Tables(s, dir, "documents")
        .filter(col("doc_id") % 11 === 0).select(col("doc_id"))
      Multimodal.purgeFrameLedger(ledger, occ, deleted, "doc_id")
        .filter(col("n_occ") > 1)
        .orderBy(col("frame_digest"))
    },
    Some("""
      WITH fr AS (
        SELECT doc_id, i, md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM documents,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i))
        WHERE doc_id % 11 <> 0),
      fst AS (
        SELECT dg, doc_id, i,
               ROW_NUMBER() OVER (PARTITION BY dg
                 ORDER BY doc_id ASC, i ASC) AS rn
        FROM fr),
      agg AS (SELECT dg, COUNT(*) AS n FROM fr GROUP BY dg)
      SELECT f.dg AS frame_digest,
             CAST(f.doc_id AS BIGINT) AS first_doc,
             CAST(f.i AS INTEGER) AS first_idx,
             CAST(a.n AS BIGINT) AS n_occ
      FROM fst f JOIN agg a USING (dg)
      WHERE f.rn = 1 AND a.n > 1
      ORDER BY f.dg
    """))

  // ---------------------------------------------------------------- q233
  // Frame-ledger UPSERT — a re-uploaded media document (same id, new
  // payload: here the text deterministically REVERSES, so the oracle
  // can replay the new frames) is the q224 purge composed with the
  // q213 merge: the old payload's digests re-elect or vanish, the new
  // payload's digests min-merge in — O(affected occurrences) +
  // O(new frames), history never re-cut. With q213 (append) and q224
  // (delete) this closes the media ledger's lifecycle; the oracle
  // recomputes the ledger over the corpus with the restated docs'
  // payloads replaced. Output: the post-upsert duplicate-provenance
  // report.
  private val q233 = Q(
    "q233_frame_ledger_upsert",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      def frames(d: org.apache.spark.sql.DataFrame) =
        Multimodal.sampleFrames(
          Multimodal.withPayload(d, "doc_id", "text"),
          "doc_id", frameSize = 64, stride = 1)
      val all = frames(docs)
      val restatedIds = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"))
      val restatedNew = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), reverse(col("text")).as("text"))
      Multimodal.mergeFrameLedger(
          Multimodal.purgeFrameLedger(
            Multimodal.frameLedger(all, "doc_id"),
            Multimodal.frameOccurrences(all, "doc_id"),
            restatedIds, "doc_id"),
          Multimodal.frameLedger(frames(restatedNew), "doc_id"))
        .filter(col("n_occ") > 1)
        .orderBy(col("frame_digest"))
    },
    Some("""
      WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN reverse(text)
                    ELSE text END AS text
        FROM documents),
      fr AS (
        SELECT doc_id, i, md5(f) AS dg
        FROM (
          SELECT doc_id, i, substring(text, CAST(i * 64 + 1 AS INT), 64) AS f
          FROM docs2,
               UNNEST(generate_series(0,
                 CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
                 t(i))),
      fst AS (
        SELECT dg, doc_id, i,
               ROW_NUMBER() OVER (PARTITION BY dg
                 ORDER BY doc_id ASC, i ASC) AS rn
        FROM fr),
      agg AS (SELECT dg, COUNT(*) AS n FROM fr GROUP BY dg)
      SELECT f.dg AS frame_digest,
             CAST(f.doc_id AS BIGINT) AS first_doc,
             CAST(f.i AS INTEGER) AS first_idx,
             CAST(a.n AS BIGINT) AS n_occ
      FROM fst f JOIN agg a USING (dg)
      WHERE f.rn = 1 AND a.n > 1
      ORDER BY f.dg
    """))

  def all: Seq[Q] = Seq(q27, q28, q206, q210, q213, q214, q223, q224,
    q233)
}
