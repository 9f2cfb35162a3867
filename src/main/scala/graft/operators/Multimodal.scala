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
