package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by domain packs; each entry pairs a Spark
  * implementation with a DuckDB oracle (where SQL-expressible).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.queries.CoreQueries,
    graft.queries.PodcastQueries,
    graft.queries.DedupQueries,
    graft.queries.SimilarityQueries,
    graft.queries.TextQueries,
    graft.queries.MultimodalQueries,
    graft.queries.StreamingQueries,
    graft.queries.SinkQueries,
    graft.queries.PipelineQueries,
    graft.queries.CurationQueries,
    graft.queries.TemporalQueries,
    graft.queries.SketchQueries,
    graft.queries.SearchQueries,
    graft.queries.GraphQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's heart: left-enrich the fact side with the dim, validate
    * join totality, aggregate (spotify_eps.py:185-193 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.all.find(_.name == "q03_join_enrich").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.all).map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.all).flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
