package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, QueryPack, Tables}
import graft.ops.{ChartOps, EnrichOps}

/** Drives the ACTUAL reference-pipeline operators (graft.ops.*) under the
  * DuckDB oracle gate, on chart-shaped frames synthesized from the
  * testdata star schema (FIXTURES.md §B role mapping: orders ⟕ customer
  * stands in for chart ⟕ episode).
  */
object PodcastQueries extends QueryPack {

  // ---------------------------------------------------------------- q14
  // The flagship silver transform end-to-end: build a chart-shaped frame
  // (top-200 per "region" = order status, W1 ranking), strip URI prefixes
  // (F1/F2), left-enrich against the dim (J1), validate totality +
  // name equality (J2/P5), drop join duplicates (P3).
  private val q14 = Q(
    "q14_podcast_enrich",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val chart = orders
        .join(broadcast(customer), $"o_custkey" === $"c_custkey")
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 200)
        .select(
          to_date($"o_orderdate").as("date"),
          $"rank",
          $"o_orderstatus".as("region"),
          lit("NEW").as("chartRankMove"),
          concat(lit("spotify:episode:"), $"o_custkey").as("episodeUri"),
          concat(lit("spotify:show:"), $"c_nationkey").as("showUri"),
          $"c_name".as("episodeName"))
        .withColumn("episodeUri", ChartOps.stripEpisodePrefix($"episodeUri"))
        .withColumn("showUri", ChartOps.stripShowPrefix($"showUri"))
      val episodes = customer.select(
        $"c_custkey".cast("string").as("id"),
        $"c_name".as("name"),
        $"c_mktsegment".as("show.name"),
        $"c_nationkey".as("show.total_episodes"))
      EnrichOps.enrichValidated(chart, episodes)
        .orderBy($"region", $"rank")
    },
    Some("""
      WITH ranked AS (
        SELECT CAST(o_orderdate AS DATE) AS "date",
               CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS "rank",
               o_orderstatus AS region,
               'NEW' AS chartRankMove,
               CAST(o_custkey AS VARCHAR) AS episodeUri,
               CAST(c_nationkey AS VARCHAR) AS showUri,
               c_name AS episodeName,
               c_mktsegment AS "show.name",
               c_nationkey AS "show.total_episodes"
        FROM orders JOIN customer ON o_custkey = c_custkey)
      SELECT "date", "rank", region, chartRankMove, episodeUri, showUri,
             episodeName, "show.name", "show.total_episodes"
      FROM ranked WHERE "rank" <= 200
      ORDER BY region, "rank"
    """))

  // ---------------------------------------------------------------- q15
  // The bronze JSON parse path end-to-end: serialize per-region chart
  // payloads (deterministic order via array_sort on a leading unique
  // key, which from_json then ignores as an unknown field) and run the
  // real posexplode-based parser — rank = 1-based array position (W1,
  // spotify_eps.py:75-78). Bounded to <1000 keys so the per-region
  // payload stays small at any scale factor (collect_list is the ingest
  // boundary here, not an engine op).
  private val q15 = Q(
    "q15_chart_parse",
    (s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "orders")
        .filter($"o_orderkey" < 1000)
        .select($"o_orderstatus".as("region"),
          struct(
            $"o_orderkey".as("k"),
            concat(lit("spotify:episode:"), $"o_orderkey").as("episodeUri"),
            concat(lit("spotify:show:"), $"o_custkey").as("showUri"),
            $"o_orderpriority".as("episodeName"),
            $"o_orderstatus".as("chartRankMove")).as("e"))
        .groupBy($"region")
        .agg(to_json(array_sort(collect_list($"e"))).as("payload"))
        .withColumn("date", lit("2024-10-22"))
      ChartOps.parsePayloads(payloads).orderBy($"region", $"rank")
    },
    Some("""
      SELECT DATE '2024-10-22' AS "date",
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY o_orderkey ASC) AS INT) AS "rank",
             o_orderstatus AS region,
             o_orderstatus AS chartRankMove,
             CAST(o_orderkey AS VARCHAR) AS episodeUri,
             CAST(o_custkey AS VARCHAR) AS showUri,
             o_orderpriority AS episodeName
      FROM orders WHERE o_orderkey < 1000
      ORDER BY region, "rank"
    """))

  // ---------------------------------------------------------------- q40
  // S2 end-to-end: the 50-per-call batched point-lookup. Ids stream
  // through BatchedLookup.fetchPayloads (mapPartitions chunking — the
  // reference's driver loop, spotify_eps.py:115-118, distributed), the
  // fixture service answers each batch with a /v1/episodes-shaped
  // payload, and the REAL parse path (EpisodeOps.parsePayloads)
  // flattens it. The oracle recomputes the service's pure per-id fields
  // directly, so equality proves no id is dropped, duplicated, or
  // mis-parsed anywhere in the chunk/fetch/parse loop.
  private val q40 = Q(
    "q40_batched_lookup",
    (s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 7 === 0)
        .select($"o_orderkey".as("id"))
      val payloads = graft.ops.BatchedLookup.fetchPayloads(
        ids, "id", batchSize = 50,
        graft.ops.BatchedLookup.fixtureEpisodeService)
      graft.ops.EpisodeOps.parsePayloads(payloads)
        .select($"id", $"name", $"duration_ms")
        .orderBy($"id")
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             'ep-' || CAST(o_orderkey AS VARCHAR) AS name,
             o_orderkey % 100000 AS duration_ms
      FROM orders WHERE o_orderkey % 7 = 0
      ORDER BY id
    """))

  // ---------------------------------------------------------------- q41
  // Precision-aware release_date parse (SURVEY §7.4.2): date strings of
  // three granularities (+ one deliberately malformed slice) derive a
  // true DATE anchored at the interval start, NULL on garbage — the
  // derived-column policy the reference leaves implicit in its string
  // pair (spotify_eps.py:144-145).
  private val q41 = Q(
    "q41_release_date_parse",
    (s, dir) => {
      import s.implicits._
      val src = Tables(s, dir, "orders").select(
        $"o_orderkey".as("id"),
        when($"o_orderkey" % 17 === 0, lit("not-a-date"))
          .when($"o_orderkey" % 3 === 0, date_format($"o_orderdate", "yyyy-MM-dd"))
          .when($"o_orderkey" % 3 === 1, date_format($"o_orderdate", "yyyy-MM"))
          .otherwise(date_format($"o_orderdate", "yyyy")).as("release_date"),
        when($"o_orderkey" % 3 === 0, "day")
          .when($"o_orderkey" % 3 === 1, "month")
          .otherwise("year").as("release_date_precision"))
      graft.ops.EpisodeOps.withReleaseDate(src).orderBy($"id")
    },
    Some("""
      SELECT id, release_date, release_date_precision,
             CASE release_date_precision
               WHEN 'day'   THEN CAST(try_strptime(release_date, '%Y-%m-%d') AS DATE)
               WHEN 'month' THEN CAST(try_strptime(release_date || '-01', '%Y-%m-%d') AS DATE)
               WHEN 'year'  THEN CAST(try_strptime(release_date || '-01-01', '%Y-%m-%d') AS DATE)
             END AS release_date_parsed
      FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 17 = 0 THEN 'not-a-date'
                    WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                    WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
                    ELSE strftime(o_orderdate, '%Y') END AS release_date,
               CASE WHEN o_orderkey % 3 = 0 THEN 'day'
                    WHEN o_orderkey % 3 = 1 THEN 'month'
                    ELSE 'year' END AS release_date_precision
        FROM orders)
      ORDER BY id
    """))

  def all: Seq[Q] = Seq(q14, q15, q40, q41)
}
