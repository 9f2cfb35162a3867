package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Episode-side transforms (SURVEY.md §2: S2, P2, P6, F6).
  *
  * The reference flattens each `/v1/episodes` JSON object to 24 dotted
  * column names with a hand-written loop (`spotify_eps.py:106-156`).
  * Here: `from_json` with the full nested schema, a null/shape guard
  * (P6, `spotify_eps.py:122-129`), and a single projection that keeps
  * `show` a real struct until the flatten boundary (SURVEY §7.4.3).
  */
object EpisodeOps {

  /** Parse `{"episodes":[...]}` payload rows into nested episode rows.
    * Rows whose payload lacks `episodes`, and episode objects without
    * an `id`, are skipped exactly like the reference's guards. */
  def parsePayloads(payloads: DataFrame): DataFrame =
    payloads
      .select(explode(from_json(col("payload"), Schemas.episodesPayload)
        .getField("episodes")).as("e"))
      .filter(col("e").isNotNull && col("e.id").isNotNull)
      .select(col("e.*"))

  /** Precision-aware `release_date` parse (SURVEY §7.4.2; the raw pair
    * is `spotify_eps.py:144-145`): the API's date STRING has granularity
    * `day`/`month`/`year` recorded in a sibling column, so an
    * unconditional `to_date` would mis-parse or reject two-thirds of the
    * values. Policy (documented, not guessed): the raw string column is
    * kept verbatim; `<dateCol>_parsed` is a true DATE anchored at the
    * interval start — full date at `day`, first-of-month at `month`,
    * Jan 1 at `year` — and NULL for unknown precisions or malformed
    * strings (`try_to_date`, so ANSI mode cannot throw on API garbage). */
  def withReleaseDate(df: DataFrame, dateCol: String = "release_date",
      precisionCol: String = "release_date_precision"): DataFrame =
    df.withColumn(s"${dateCol}_parsed",
      when(col(precisionCol) === "day",
        expr(s"try_to_date(`$dateCol`, 'yyyy-MM-dd')"))
        .when(col(precisionCol) === "month",
          expr(s"try_to_date(concat(`$dateCol`, '-01'), 'yyyy-MM-dd')"))
        .when(col(precisionCol) === "year",
          expr(s"try_to_date(concat(`$dateCol`, '-01-01'), 'yyyy-MM-dd')")))

  /** P2: flatten the nested `show` struct to the reference's literal
    * dotted column names (`show.name` etc. — backtick-escaped, they are
    * NOT struct accesses in the output schema). */
  def flatten(episodes: DataFrame): DataFrame =
    episodes.select(Schemas.episodeFlatColumns.map { name =>
      if (name.startsWith("show."))
        col(name).as(name) // struct access aliased to the literal dotted name
      else col(s"`$name`")
    }: _*)
}
