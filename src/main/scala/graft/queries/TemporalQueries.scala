package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.RangeJoin

/** Round-3 temporal additions on `events`: bucketed range join
  * (interval containment without a BNLJ), sliding event-time windows
  * (q12 is tumbling-only), and the built-in `session_window` batch
  * aggregation (the declarative twin of q29's lag/cumsum plan). All
  * SUM outputs follow the suite rule: DECIMAL internally, DOUBLE out.
  */
object TemporalQueries extends QueryPack {

  // ---------------------------------------------------------------- q77
  // Range join: nightly 02:00-04:00 maintenance windows (one per day,
  // generated — the q55 date-spine idiom) matched to the events whose
  // timestamp they contain. Day-bucketed equi-join + residual range
  // predicate → BroadcastHashJoin, never BroadcastNestedLoopJoin
  // (PlanAuditSpec holds without an exception).
  private val q77 = Q(
    "q77_range_join",
    (s, dir) => {
      import s.implicits._
      val wins = s.range(30)
        .select((expr("timestamp'2024-01-01 02:00:00'") +
          expr("make_interval(0, 0, 0, CAST(id AS INT), 0, 0, 0)"))
          .as("win_start"))
        .withColumn("win_end", expr("win_start + INTERVAL 2 HOURS"))
      RangeJoin.containmentJoin(Tables.events(s, dir), "ts",
          wins, "win_start", "win_end", bucketMicros = 86400L * 1000000L)
        .groupBy($"win_start")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(14,2)"))
            .cast("double").as("sum_value"))
        .orderBy($"win_start")
    },
    Some("""
      WITH wins AS (
        SELECT ws AS win_start, ws + INTERVAL 2 HOUR AS win_end
        FROM UNNEST(generate_series(TIMESTAMP '2024-01-01 02:00:00',
                                    TIMESTAMP '2024-01-30 02:00:00',
                                    INTERVAL 1 DAY)) t(ws))
      SELECT win_start, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events e JOIN wins w
        ON e.ts >= w.win_start AND e.ts < w.win_end
      GROUP BY win_start
      ORDER BY win_start
    """))

  // ---------------------------------------------------------------- q78
  // Sliding event-time windows: 2-hour windows every hour — each event
  // lands in exactly two windows (Spark explodes map-side; no
  // per-window re-scan). Completes the window family: tumbling q12,
  // session q29/q79, range frame q53.
  private val q78 = Q(
    "q78_sliding_window",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(14,2)"))
            .cast("double").as("sum_value"))
        .select($"w.start".as("win_start"), $"n_events", $"sum_value")
        .orderBy($"win_start")
    },
    Some("""
      SELECT win_start, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM (
        SELECT value, UNNEST([
          time_bucket(INTERVAL '1 hour', ts),
          time_bucket(INTERVAL '1 hour', ts) - INTERVAL 1 HOUR]) AS win_start
        FROM events)
      GROUP BY win_start
      ORDER BY win_start
    """))

  // ---------------------------------------------------------------- q79
  // Built-in session_window (30-min gap) batch aggregation — the
  // declarative sibling of q29's manual lag/cumsum sessionization.
  // Spark merges an event into a session iff it starts STRICTLY before
  // session_end (= last ts + gap); the oracle's is_new uses >= gap
  // accordingly. Session end is last event + gap by definition.
  private val q79 = Q(
    "q79_session_window",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("session_start"),
          $"w.end".as("session_end"), $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events
      FROM (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC
                 ROWS UNBOUNDED PRECEDING) AS seq
        FROM (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev_ts IS NULL
                           OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM (
            SELECT user_id, event_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_ts
            FROM events)))
      GROUP BY user_id, seq
      ORDER BY user_id, session_start
    """))

  // ---------------------------------------------------------------- q94
  // SCD2 dimension history from the event log: per user, consecutive
  // equal event_types collapse into validity intervals (valid_from
  // inclusive, valid_to = next change, NULL while current). One
  // entity-keyed shuffle serves both windows; output is O(changes),
  // not O(events) — the standard log→dimension compaction.
  private val q94 = Q(
    "q94_scd2_intervals",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      graft.ops.DiffOps.scd2Intervals(e, "user_id", "event_type",
          "ts_us", Seq("ts_us", "event_id"))
        .select(col("user_id"), col("event_type"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from_us"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        FROM events),
      chg AS (
        SELECT user_id, event_type, ts_us,
               LAG(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
               event_id
        FROM e),
      runs AS (
        SELECT user_id, event_type, ts_us AS valid_from_us, event_id
        FROM chg WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, valid_from_us,
             LEAD(valid_from_us) OVER (
               PARTITION BY user_id
               ORDER BY valid_from_us, event_id) AS valid_to_us,
             LEAD(valid_from_us) OVER (
               PARTITION BY user_id
               ORDER BY valid_from_us, event_id) IS NULL AS is_current
      FROM runs
      ORDER BY user_id, valid_from_us
    """))

  // --------------------------------------------------------------- q112
  // Point-in-time enrichment (the warehouse-correctness join): every
  // purchase picks up the user's state — the SCD2 interval built from
  // the NON-purchase event history — valid at the purchase timestamp.
  // Equi-join on the entity with the range predicate as post-filter
  // (co-partitioned, no interval explosion); intervals tile without
  // overlap so the left join preserves the fact count exactly.
  private val q112 = Q(
    "q112_pit_enrich",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val dim = graft.ops.DiffOps.scd2Intervals(
          e.filter(col("event_type") =!= "purchase"),
          "user_id", "event_type", "ts_us", Seq("ts_us", "event_id"))
      val facts = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      graft.ops.DiffOps.pitLookup(facts, dim, "user_id", "ts_us")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type").as("state"),
          col("valid_from").as("state_since_us"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        FROM events),
      chg AS (
        SELECT user_id, event_type, ts_us,
               LAG(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
               event_id
        FROM e WHERE event_type <> 'purchase'),
      runs AS (
        SELECT user_id, event_type, ts_us AS valid_from, event_id
        FROM chg WHERE prev IS NULL OR prev <> event_type),
      iv AS (
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER (
                 PARTITION BY user_id
                 ORDER BY valid_from, event_id) AS valid_to
        FROM runs),
      p AS (
        SELECT user_id, event_id, ts_us FROM e
        WHERE event_type = 'purchase')
      SELECT p.user_id, p.event_id, p.ts_us,
             i.event_type AS state, i.valid_from AS state_since_us
      FROM p LEFT JOIN iv i
        ON i.user_id = p.user_id
       AND i.valid_from <= p.ts_us
       AND (i.valid_to IS NULL OR p.ts_us < i.valid_to)
      ORDER BY p.user_id, p.ts_us, p.event_id
    """))

  // ---------------------------------------------------------------- q97
  // Funnel analysis: per user the earliest view → first click at-or-
  // after it → first purchase at-or-after that, and the stage reached.
  // Three conditional min-aggregations over the same user-keyed
  // shuffle; timestamps ride as epoch micros. NULL propagates through
  // later stages (no click ⇒ no purchase counted), so `stage` is the
  // standard funnel metric.
  private val q97 = Q(
    "q97_funnel",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val views = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts_us")))
          .as("view_ts"))
      val clicks = views.join(e, "user_id")
        .groupBy(col("user_id"), col("view_ts"))
        .agg(min(when(col("event_type") === "click" &&
          col("ts_us") >= col("view_ts"), col("ts_us"))).as("click_ts"))
      val funnel = clicks.join(e, "user_id")
        .groupBy(col("user_id"), col("view_ts"), col("click_ts"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts_us") >= col("click_ts"), col("ts_us"))).as("purchase_ts"))
      funnel
        .withColumn("stage",
          when(col("purchase_ts").isNotNull, lit("purchase"))
            .when(col("click_ts").isNotNull, lit("click"))
            .when(col("view_ts").isNotNull, lit("view"))
            .otherwise(lit("none")))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      v AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS view_ts
        FROM e GROUP BY user_id),
      c AS (
        SELECT v.user_id, v.view_ts,
               MIN(CASE WHEN e.event_type = 'click'
                         AND e.ts_us >= v.view_ts THEN e.ts_us END) AS click_ts
        FROM v JOIN e ON e.user_id = v.user_id
        GROUP BY v.user_id, v.view_ts),
      p AS (
        SELECT c.user_id, c.view_ts, c.click_ts,
               MIN(CASE WHEN e.event_type = 'purchase'
                         AND e.ts_us >= c.click_ts THEN e.ts_us END) AS purchase_ts
        FROM c JOIN e ON e.user_id = c.user_id
        GROUP BY c.user_id, c.view_ts, c.click_ts)
      SELECT user_id, view_ts, click_ts, purchase_ts,
             CASE WHEN purchase_ts IS NOT NULL THEN 'purchase'
                  WHEN click_ts IS NOT NULL THEN 'click'
                  WHEN view_ts IS NOT NULL THEN 'view'
                  ELSE 'none' END AS stage
      FROM p
      ORDER BY user_id
    """))

  // ---------------------------------------------------------------- q98
  // Retention cohorts: users bucketed by their first active day, then
  // distinct active users per (cohort_day, day_offset). Days are
  // integer epoch-micros DIV 86400000000 — no timezone/date-cast trap,
  // identical in any engine. Two user-keyed aggregations + one
  // partial-combining count-distinct on the cohort grid.
  private val q98 = Q(
    "q98_retention_cohorts",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
      val cohorts = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
      SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
             COUNT(DISTINCT e.user_id) AS n_users
      FROM e JOIN cohorts c ON c.user_id = e.user_id
      GROUP BY c.cohort_day, e.day - c.cohort_day
      ORDER BY cohort_day, day_offset
    """))

  // --------------------------------------------------------------- q107
  // Rolling active users: exact DAU and trailing-7-day WAU per day,
  // plus the DAU/WAU stickiness ratio. The window is an EXPLODE (each
  // (day, user) row fans to the 7 windows it belongs to), never a
  // non-equi join — count-distinct then partial-combines on the
  // (window_day) grid. Days are integer epoch-day arithmetic (the q98
  // discipline); the single dau/wau division is bit-identical in any
  // engine. Synthetic trailing windows past the data's last day drop
  // out via the inner join with the observed-day DAU table.
  private val q107 = Q(
    "q107_rolling_actives",
    (s, dir) => {
      val du = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
        .transform(graft.util.CacheScope.persist)
      val dau = du.groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as("dau"))
      val wau = du
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          (col("dau") / col("wau")).as("stickiness"))
        .orderBy(col("day"))
    },
    Some("""
      WITH du AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events),
      dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
      w AS (
        SELECT du.day + o AS day, du.user_id
        FROM du, UNNEST(generate_series(0, 6)) t(o)),
      wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM w GROUP BY day)
      SELECT d.day, d.dau, w2.wau,
             CAST(d.dau AS DOUBLE) / CAST(w2.wau AS DOUBLE) AS stickiness
      FROM dau d JOIN wau w2 USING (day)
      ORDER BY day
    """))

  // --------------------------------------------------------------- q109
  // Rate anomaly detection: flag hours whose event count spikes ≥ 3
  // POPULATION standard deviations above the trailing-24h mean (σ² =
  // Sxx/c − (Sx/c)², divide by c not c−1 — the window is the whole
  // trailing frame, not a sample of it) — with the
  // z-test done ENTIRELY in integer arithmetic. z > 3 with
  // μ = Sx/c, σ² = (Sxx·c − Sx²)/c² rearranges to
  //   (c·x − Sx)² · 1 > 9 · (c·Sxx − Sx²)   [one-sided: c·x > Sx]
  // — counts are integers, so both sides are exact BIGINTs: no sqrt,
  // no division, no libm, bit-identical in any engine (headroom: the
  // squared term overflows BIGINT only past ~1.3e8 events/hour/type;
  // beyond that, bucket finer or scale counts down first). The trailing
  // frame is a rangeBetween over the HOURLY table (O(hours·types)
  // rows), never the event stream; the hourly rollup itself
  // partial-combines map-side. The ops-monitoring primitive next to
  // q107's DAU/WAU.
  private val q109 = Q(
    "q109_rate_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rangeBetween(-24, -1)
      hourly
        .withColumn("sx", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("sxx", coalesce(sum(col("n") * col("n")).over(w), lit(0L)))
        .withColumn("c", count(col("n")).over(w))
        .withColumn("is_spike",
          col("c") >= 12 && col("c") * col("n") > col("sx") &&
            (col("c") * col("n") - col("sx")) *
              (col("c") * col("n") - col("sx")) >
              lit(9L) * (col("c") * col("sxx") - col("sx") * col("sx")))
        .select(col("hour"), col("event_type"), col("n"), col("sx"),
          col("c"), col("is_spike"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""
      WITH hourly AS (
        SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT hour, event_type, n,
               CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS sx,
               CAST(COALESCE(SUM(n * n) OVER w, 0) AS BIGINT) AS sxx,
               COUNT(n) OVER w AS c
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      SELECT hour, event_type, n, sx, c,
             (c >= 12 AND c * n > sx AND
              (c * n - sx) * (c * n - sx) > 9 * (c * sxx - sx * sx))
               AS is_spike
      FROM stats
      ORDER BY hour, event_type
    """))

  // --------------------------------------------------------------- q152
  // Behavior-sequence dataset export: one row per user — untruncated
  // event count plus the first 50 event types in (ts, event_id) order,
  // JSON-serialized. The per-key truncation runs BEFORE the per-key
  // collection (rank filter → WindowGroupLimit, streamed with spill),
  // so the collect buffer is bounded at 50 rows for every key — a hot
  // user's million-event history never sits in one aggregation buffer.
  private val q152 = Q(
    "q152_user_event_sequences",
    (s, dir) => {
      graft.operators.Sequences.eventSequences(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", maxLen = 50)
        .select(col("user_id"), col("n_events"),
          to_json(col("seq")).as("seq"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(to_json((list(event_type ORDER BY ts, event_id))[1:50])
               AS VARCHAR) AS seq
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """))

  def all: Seq[Q] = Seq(q77, q78, q79, q94, q97, q98, q107, q109, q112,
    q152)
}
