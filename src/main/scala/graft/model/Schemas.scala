package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's data shapes (FIXTURES.md §A).
  * The reference declares schemas as untyped column-name lists
  * (`spotify_eps.py:70-73,106-113`); we fix the types the reference's
  * data actually carries (SURVEY.md §1.3).
  */
object Schemas {

  /** One chart API entry — array order encodes rank
    * (`spotify_eps.py:75-84`, FIXTURES.md §A1). */
  val chartEntry: StructType = StructType(Seq(
    StructField("episodeUri", StringType),
    StructField("showUri", StringType),
    StructField("episodeName", StringType),
    StructField("chartRankMove", StringType)))

  /** Nested `show` object of an episode (`spotify_eps.py:135-155`). */
  val show: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("publisher", StringType),
    StructField("copyrights", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("type", StringType))))),
    StructField("explicit", BooleanType),
    StructField("href", StringType),
    StructField("html_description", StringType),
    StructField("is_externally_hosted", BooleanType),
    StructField("languages", ArrayType(StringType)),
    StructField("media_type", StringType),
    StructField("total_episodes", IntegerType),
    StructField("type", StringType),
    StructField("uri", StringType)))

  /** One episode object from `/v1/episodes` (`spotify_eps.py:120-156`,
    * FIXTURES.md §A2). `release_date` stays a string — its granularity
    * lives in the sibling `release_date_precision` column (SURVEY §7.4.2).
    */
  val episode: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType),
    StructField("is_externally_hosted", BooleanType),
    StructField("is_playable", BooleanType),
    StructField("language", StringType),
    StructField("languages", ArrayType(StringType)),
    StructField("release_date", StringType),
    StructField("release_date_precision", StringType),
    StructField("show", show)))

  /** `{"episodes": [...]}` response envelope (`spotify_eps.py:122`). */
  val episodesPayload: StructType =
    StructType(Seq(StructField("episodes", ArrayType(episode))))

  /** The 7-column bronze chart table (`spotify_eps.py:70-73`). */
  val chartTable: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("rank", IntegerType),
    StructField("region", StringType),
    StructField("chartRankMove", StringType),
    StructField("episodeUri", StringType),
    StructField("showUri", StringType),
    StructField("episodeName", StringType)))

  /** The 24 flattened episode columns in reference output order —
    * dotted `show.*` names are LITERAL column names
    * (`spotify_eps.py:106-113,135-155`; SURVEY §7.4.3). */
  val episodeFlatColumns: Seq[String] = Seq(
    "id", "name", "description", "duration_ms", "explicit",
    "is_externally_hosted", "is_playable", "language", "languages",
    "release_date", "release_date_precision",
    "show.name", "show.description", "show.publisher", "show.copyrights",
    "show.explicit", "show.href", "show.html_description",
    "show.is_externally_hosted", "show.languages", "show.media_type",
    "show.total_episodes", "show.type", "show.uri")
}
