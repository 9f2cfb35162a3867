package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, flowing
  * through joins/filters like any other column.
  *
  * The DECODE step is a clearly-marked deterministic STUB — real codec
  * libraries are not in this container. Everything around it is real
  * Spark machinery: schemas, Encoders, partition-wise batch processing
  * via typed mapPartitions (the Scala-side equivalent of mapInPandas:
  * one iterator per partition, amortized per-batch setup, no per-row
  * driver involvement), and frame sampling as binary slicing.
  */
object Multimodal {

  /** A media row: opaque payload + metadata, as it would arrive from an
    * object-store manifest join. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)

  /** Stub "decoded" features — deterministic functions of the raw bytes
    * standing in for pixel/sample statistics. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, n_lower: Long,
      n_space: Long, n_digit: Long, byte_sum_mod: Long)

  /** Attach a binary payload + metadata to a text frame (in production
    * the payload column arrives from the store; here it is derived so
    * the plumbing is testable end-to-end). Metadata: byte size, content
    * digest, synthetic modality tag. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
      md5(col(textCol)).as("digest"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("kind"))

  /** ======= STUB DECODER =======
    * Stands in for image decode / audio resample / video frame extract.
    * Deterministic byte statistics so tests and oracles can verify the
    * plumbing; swap the body for a real codec (e.g. javax.imageio) in a
    * container that has one. Partition-wise: one pass per partition,
    * zero driver round-trips, safe for 100 TB of payloads. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var lower = 0L; var space = 0L; var digit = 0L; var sum = 0L
        var i = 0
        val bytes = r.payload
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          if (b >= 'a' && b <= 'z') lower += 1
          if (b == ' ') space += 1
          if (b >= '0' && b <= '9') digit += 1
          sum += b
          i += 1
        }
        MediaFeatures(r.doc_id, bytes.length.toLong, lower, space, digit,
          sum % 997)
      }
    }
  }

  /** Frame sampling: cut the payload into `frameSize`-byte frames and
    * keep every `stride`-th one — the binary-slicing shape of video
    * frame extraction, as pure column expressions (substring works on
    * BINARY and returns BINARY). */
  def sampleFrames(withPayloadDf: DataFrame, idCol: String,
      frameSize: Int, stride: Int): DataFrame =
    withPayloadDf
      .select(col(idCol), col("n_bytes"),
        // empty payload → empty array → posexplode drops the row (a
        // clamped sequence bound would emit one phantom 0-byte frame)
        posexplode(expr(
          s"""CASE WHEN n_bytes = 0 THEN array()
              ELSE transform(
                sequence(0, CAST(ceil(n_bytes / $frameSize.0) - 1 AS INT)),
                i -> substring(payload, i * $frameSize + 1, $frameSize))
              END"""))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
      .select(col(idCol), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        col("frame"))

  /** FRAME-level exact dedup — [[ParaDedup]]'s keep-first discipline
    * applied to BINARY frames, connecting the multimodal column to
    * the dedup stack: a frame occurrence survives iff it is the FIRST
    * occurrence of its content digest corpus-wide, ordered by
    * (doc_id, frame_idx) — the deterministic smallest-wins rule every
    * dedup tier uses. Input is [[sampleFrames]]' shape; output is
    * every frame row with its digest and keep verdict (the audit
    * form — `filter(keep)` is the deduped frame set).
    *
    * Scale shape: the frame PAYLOAD never crosses the exchange — rows
    * project to (id, frame_idx, frame_bytes, md5 digest) BEFORE the
    * digest-keyed keep-first window, so at 100 TB of video the
    * shuffle moves 16-byte digests, not media (ShuffleMetricsSpec
    * pins the byte ratio against the payload-through-exchange form).
    * Unlike [[ParaDedup.dedupKeepFirst]] — which must ship text to
    * its winner-decision site because it REASSEMBLES surviving
    * documents — the frame election needs only coordinates: a caller
    * wanting surviving payloads joins the kept (id, frame_idx) pairs
    * back to the frame source, an id-keyed equi-join that AQE
    * broadcasts when the survivor set is small. */
  def dedupFrames(frames: DataFrame, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("frame_digest"))
      .orderBy(col(idCol).asc, col("frame_idx").asc)
    frames.select(col(idCol), col("frame_idx"), col("frame_bytes"),
        md5(col("frame")).as("frame_digest"))
      .withColumn("keep", row_number().over(w) === 1)
  }

  /** Per-document duplicate-frame mass over [[dedupFrames]]' verdicts
    * — the report a curator reads before paying to store or train on
    * a media corpus: how many of each document's frames are retreads
    * of frames seen earlier (intros, title cards, stock footage), and
    * how many bytes the dedup would reclaim. Map-side combined; the
    * exchange carries doc keys. */
  def frameDupCensus(flagged: DataFrame, idCol: String): DataFrame =
    fullFrameCensus(flagged, idCol)
      .select(col(idCol), col("n_frames"), col("n_kept_frames"),
        col("n_dup_frames"), col("dup_bytes"))

  /** The CURATION view of [[dedupFrames]]' verdicts — per document,
    * total/retread frame counts plus the byte mass a store would
    * actually pay for (the KEPT frames' bytes): the inputs the media
    * budget stage admits on, where the text pipeline admits on
    * tokens. */
  def mediaCurationCensus(flagged: DataFrame, idCol: String): DataFrame =
    fullFrameCensus(flagged, idCol)
      .select(col(idCol), col("n_frames"), col("n_dup_frames"),
        col("kept_bytes"))

  /** One aggregation behind both census views — kept and dup masses
    * tile each doc's total BY CONSTRUCTION (a single sum splits on
    * the keep flag), so the audit view (what dedup reclaims) and the
    * curation view (what a store pays for) cannot drift. Map-side
    * combined; the exchange carries doc keys. */
  private def fullFrameCensus(flagged: DataFrame, idCol: String): DataFrame =
    flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept_frames"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dup_frames"),
        sum(when(col("keep"), lit(0L)).otherwise(col("frame_bytes")))
          .as("dup_bytes"),
        sum(when(col("keep"), col("frame_bytes")).otherwise(lit(0L)))
          .as("kept_bytes"))

  /** Frame-digest LEDGER — [[dedupFrames]]' election state made
    * STORABLE, one row per distinct digest: the earliest
    * (doc, frame_idx) coordinate (provenance: where this frame first
    * appeared) and the occurrence count. Rows project to digests
    * before the groupBy, so the exchange carries 16-byte keys plus
    * two scalars — never payloads (the [[dedupFrames]] discipline). */
  def frameLedger(frames: DataFrame, idCol: String): DataFrame =
    ledgerFromOccurrences(frameOccurrences(frames, idCol), idCol)

  /** The election aggregation both the ledger BUILD and the purge's
    * RE-ELECTION run — one definition, so the tie-break struct and
    * the count semantics cannot drift between the two paths the
    * q213/q224 oracle equality compares. */
  private def ledgerFromOccurrences(occ: DataFrame,
      idCol: String): DataFrame =
    occ
      .groupBy(col("frame_digest"))
      .agg(min(struct(col(idCol), col("frame_idx"))).as("__f"),
        count(lit(1)).as("n_occ"))
      .select(col("frame_digest"),
        col(s"__f.$idCol").as("first_doc"),
        col("__f.frame_idx").as("first_idx"),
        col("n_occ"))

  /** O(new) ledger MERGE: first-occurrence coordinates combine by
    * MIN — (doc, frame_idx) pairs form a semilattice under least, the
    * order-free property that makes the merge exact whatever the
    * batch cut — and occurrence counts ADD. Union + re-group keeps
    * both sides ledger-sized through the exchange; the day's delta is
    * batch-proportional, history frames are never re-read. */
  def mergeFrameLedger(prior: DataFrame, delta: DataFrame): DataFrame =
    prior.unionByName(delta)
      .groupBy(col("frame_digest"))
      .agg(min(struct(col("first_doc"), col("first_idx"))).as("__f"),
        sum(col("n_occ")).as("n_occ"))
      .select(col("frame_digest"),
        col("__f.first_doc").as("first_doc"),
        col("__f.first_idx").as("first_idx"),
        col("n_occ"))

  /** The OCCURRENCE index behind the ledger — one (digest, doc, idx,
    * bytes) row per frame, the positional table a deletion-capable
    * deployment stores alongside the [[frameLedger]] aggregate
    * (payloads project to digests before the write, as everywhere in
    * this family). */
  def frameOccurrences(frames: DataFrame, idCol: String): DataFrame =
    frames.select(md5(col("frame")).as("frame_digest"),
      col(idCol), col("frame_idx"), col("frame_bytes"))

  /** DELETE from the frame ledger — the semilattice's deletion
    * discipline, and deliberately NOT [[graft.operators.Ledger
    * .retract]]: counts subtract, but a MIN cannot un-merge (the
    * evicted doc may BE the first occurrence, and the runner-up is
    * not in the aggregate), so deletion needs the stored occurrence
    * index and the q183 affected-group rule — only digests with ≥ 1
    * occurrence in a deleted doc RE-ELECT, from their surviving
    * occurrences; every other ledger row passes through untouched.
    * Work is O(affected digests' occurrences), never a corpus
    * re-scan: the affected set is deleted-proportional and broadcasts
    * into a semi-join on the occurrence index (map-side filter) and
    * an anti-join on the ledger; a digest whose every occurrence was
    * deleted vanishes — an empty election has no winner. */
  def purgeFrameLedger(ledger: DataFrame, occurrences: DataFrame,
      deletedDocs: DataFrame, idCol: String): DataFrame = {
    val dels = deletedDocs.select(col(idCol)).distinct()
    // persisted, not re-derived per consumer: `affected` feeds BOTH
    // the re-election semi-join and the passthrough anti-join — a
    // missed exchange-reuse would otherwise scan the occurrence index
    // twice (the structural-single-scan discipline)
    val affected = occurrences
      .join(broadcast(dels), Seq(idCol), "left_semi")
      .select(col("frame_digest")).distinct()
      .transform(graft.util.CacheScope.persist)
    val reelected = ledgerFromOccurrences(
      occurrences
        .join(broadcast(affected), Seq("frame_digest"), "left_semi")
        .join(broadcast(dels), Seq(idCol), "left_anti"),
      idCol)
    ledger.join(broadcast(affected), Seq("frame_digest"), "left_anti")
      .unionByName(reelected)
  }

  /** [[dedupFrames]] against STORED history — arrival-order keep-first
    * (the incremental/streaming reality: the copy already in the
    * ledger wins, a new arrival of a seen digest is the retread
    * regardless of its id — unlike the batch election, which orders
    * the whole corpus by (doc, frame_idx)): a day frame keeps iff its
    * digest is ABSENT from the ledger and it is the day's internal
    * first occurrence. The day's distinct digest set BROADCASTS into
    * a semi-join on the ledger's digest column (the q190 novelty
    * discipline — the history-proportional ledger never shuffles
    * whole), and the surviving seen-set re-broadcasts onto the day's
    * frames; the election window runs over the day only. */
  def dedupFramesAgainstLedger(ledger: DataFrame, frames: DataFrame,
      idCol: String): DataFrame = {
    val dg = frames.select(col(idCol), col("frame_idx"),
      col("frame_bytes"), md5(col("frame")).as("frame_digest"))
    val seen = ledger.select(col("frame_digest"))
      .join(broadcast(dg.select(col("frame_digest")).distinct()),
        Seq("frame_digest"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("frame_digest"))
      .orderBy(col(idCol).asc, col("frame_idx").asc)
    dg.join(broadcast(seen.withColumn("__seen", lit(true))),
        Seq("frame_digest"), "left")
      .withColumn("keep",
        col("__seen").isNull && row_number().over(w) === 1)
      .drop("__seen")
  }

  /** Typed end-to-end: text frame → payload → stub decode. */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = withPayload(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"), col("payload"), col("kind"))
      .as[MediaRow]
    decodeFeatures(media)
  }
}
