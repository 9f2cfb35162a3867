package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DateType, IntegerType}
import graft.model.Schemas

/** Chart-side transforms (SURVEY.md §2: S1, P1, W1, F1-F3).
  *
  * The reference walks the chart JSON array with a Python loop, using the
  * array index as the 1-based rank and stripping URI prefixes by fixed
  * offset (`spotify_eps.py:66-87`). Here the whole thing is one
  * declarative plan: `posexplode(from_json(...))` materializes the array
  * position as the rank, so parsing stays distributed and set-at-once
  * over all regions (no per-region driver loop — SURVEY §2.4 A2).
  */
object ChartOps {

  /** F1: strip `spotify:episode:` (`spotify_eps.py:81` slices [16:]).
    * Regexp instead of fixed offset — self-documenting and a no-op on
    * already-stripped or malformed URIs. */
  def stripEpisodePrefix(c: Column): Column =
    regexp_replace(c, "^spotify:episode:", "")

  /** F2: strip `spotify:show:` (`spotify_eps.py:82` slices [13:]). */
  def stripShowPrefix(c: Column): Column =
    regexp_replace(c, "^spotify:show:", "")

  /** Parse raw chart payloads into the 7-column bronze chart table.
    *
    * Input: one row per (date, region) with the chart API's JSON array
    * in `payload` (ingest boundary: the 22 small per-region fetches land
    * here via `createDataFrame`; at scale this is any number of payload
    * rows, parsed executor-side).
    *
    * Rank is the 1-based array position (W1, `spotify_eps.py:75-78`) —
    * `posexplode` keeps it deterministic regardless of partitioning.
    */
  def parsePayloads(payloads: DataFrame): DataFrame =
    payloads
      .select(
        col("date").cast(DateType).as("date"),
        col("region"),
        posexplode(from_json(col("payload"), ArrayType(Schemas.chartEntry))))
      .select(
        col("date"),
        (col("pos") + 1).cast(IntegerType).as("rank"),
        col("region"),
        col("col.chartRankMove").as("chartRankMove"),
        stripEpisodePrefix(col("col.episodeUri")).as("episodeUri"),
        stripShowPrefix(col("col.showUri")).as("showUri"),
        col("col.episodeName").as("episodeName"))
}
