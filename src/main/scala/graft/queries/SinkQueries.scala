package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.ops.UnionOps

/** Sinks and the gold-CSV read-back path under the oracle gate
  * (SURVEY §2: K1 snapshot sink, K2 CSV sink, S5 prefix scan, P7
  * suffix predicate, U2 drift union). The reference CONSUMES its
  * consolidated CSV downstream (`kaggle_update_dag.py:27-47`), so the
  * round-trip itself — drifted schemas, JSON-serialized array columns,
  * null back-fill — is observable behavior, not just a side effect.
  */
object SinkQueries extends QueryPack {

  // ---------------------------------------------------------------- q39
  // Two "daily" snapshots with DRIFTED schemas (day 2 adds a string and
  // an array column) are written through the K1 dynamic-partition sink,
  // re-read as one mergeSchema+glob scan (S5/P7/U2 — missing columns
  // null-fill like pandas concat), consolidated through the K2 CSV sink
  // (arrays → JSON strings), and read BACK from the CSV. The oracle
  // computes the same frame directly from parquet: equality proves the
  // whole sink→scan→sink→scan loop is lossless for this schema.
  private val q39 = Q(
    "q39_sink_roundtrip",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      val day1 = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"),
          lit("2024-01-01").as("date"))
      val day2 = orders.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"),
          split(col("o_orderpriority"), "-").as("prio_parts"),
          lit("2024-01-02").as("date"))
      // recursive-delete scratch (see q102 note): the silver/gold trees
      // written below would otherwise outlive the process in /tmp
      val scratch = graft.util.Scratch.dir("graft_sink").toString
      val tableDir = s"$scratch/silver"
      UnionOps.writeDailySnapshot(day1, tableDir)
      UnionOps.writeDailySnapshot(day2, tableDir) // dynamic overwrite: day 1 survives
      val merged = UnionOps.readSnapshots(s, tableDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"), col("prio_parts"),
          col("date").cast("string").as("date"))
      val csvDir = s"$scratch/gold"
      UnionOps.writeGoldCsv(merged, csvDir)
      s.read
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, " +
          "o_orderpriority STRING, prio_parts STRING, date STRING")
        .option("header", "true")
        .csv(csvDir)
        .orderBy(col("date"), col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
             CAST(NULL AS VARCHAR) AS o_orderpriority,
             CAST(NULL AS VARCHAR) AS prio_parts,
             '2024-01-01' AS date
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority,
             CAST(to_json(string_split(o_orderpriority, '-')) AS VARCHAR),
             '2024-01-02'
      FROM orders WHERE o_orderstatus = 'O'
      ORDER BY date, o_orderkey
    """))

  // ---------------------------------------------------------------- q54
  // Snapshot diff: full-outer change classification between two
  // snapshot versions (added / removed / changed / unchanged, null-safe
  // per-column compare) — the "what changed since yesterday's gold"
  // question the reference cannot answer.
  private val q54 = Q(
    "q54_snapshot_diff",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val dayA = orders.filter($"o_orderkey" % 4 =!= 0)
        .select($"o_orderkey", $"o_totalprice")
      val dayB = orders.filter($"o_orderkey" % 3 =!= 0)
        .select($"o_orderkey",
          ($"o_totalprice" + when($"o_orderkey" % 5 === 0, 1.0).otherwise(0.0))
            .as("o_totalprice"))
      graft.ops.DiffOps.snapshotDiff(dayA, dayB,
          keyCols = Seq("o_orderkey"), compareCols = Seq("o_totalprice"))
        .orderBy($"o_orderkey")
    },
    Some("""
      WITH a AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0),
      b AS (
        SELECT o_orderkey,
               o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0)
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             a.o_totalprice AS o_totalprice_a,
             b.o_totalprice AS o_totalprice_b,
             CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice THEN 'unchanged'
                  ELSE 'changed' END AS diff_status
      FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
      ORDER BY o_orderkey
    """))

  // ---------------------------------------------------------------- q55
  // Date-spine completeness: which calendar days in the window have no
  // order — generated sequence spine, one anti-join probe (the holes a
  // backfill run must fill; no driver loop).
  private val q55 = Q(
    "q55_date_gaps",
    (s, dir) => {
      graft.ops.DiffOps.dateGaps(
          Tables(s, dir, "orders"), "o_orderdate",
          from = "2001-07-01", to = "2001-08-31")
        .orderBy(col("missing_date"))
    },
    Some("""
      SELECT missing_date FROM (
        SELECT CAST(UNNEST(generate_series(
          DATE '2001-07-01', DATE '2001-08-31', INTERVAL 1 DAY)) AS DATE)
          AS missing_date)
      WHERE missing_date NOT IN (
        SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders)
      ORDER BY missing_date
    """))

  // ---------------------------------------------------------------- q84
  // JSON-lines sink/source roundtrip with a NESTED payload struct:
  // click events serialize (payload object, epoch-micros timestamp —
  // the default JSON timestampFormat drops sub-millisecond precision,
  // so timestamps travel as integers), read back under an explicit
  // schema, flatten. Doubles survive bitwise (Jackson shortest
  // round-trip rendering on write, exact parse on read). The oracle
  // computes the same frame straight from parquet: equality proves the
  // JSON loop lossless.
  private val q84 = Q(
    "q84_json_roundtrip",
    (s, dir) => {
      val clicks = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          struct(col("event_type"), col("value")).as("payload"),
          unix_micros(col("ts")).as("ts_us"))
      val scratch =
        graft.util.Scratch.dir("graft_json").toString
      clicks.write.mode("overwrite").json(scratch)
      s.read
        .schema("event_id BIGINT, user_id BIGINT, " +
          "payload STRUCT<event_type: STRING, value: DOUBLE>, ts_us BIGINT")
        .json(scratch)
        .select(col("event_id"), col("user_id"),
          col("payload.event_type").as("event_type"),
          col("payload.value").as("value"), col("ts_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'
      ORDER BY event_id
    """))

  // ---------------------------------------------------------------- q85
  // ORC sink/source roundtrip: urgent orders written columnar-ORC,
  // read back with a filter that reaches the ORC reader as a pushed
  // predicate (searchArgument), aggregated. Completes the format
  // matrix: parquet (everywhere), CSV (q39), JSON (q84), ORC (here).
  private val q85 = Q(
    "q85_orc_roundtrip",
    (s, dir) => {
      import s.implicits._
      val scratch =
        graft.util.Scratch.dir("graft_orc").toString
      Tables(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .write.mode("overwrite").orc(scratch)
      s.read.orc(scratch)
        .filter($"o_totalprice" > 100000.0)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_total"))
        .orderBy($"o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """))

  // --------------------------------------------------------------- q102
  // Partition-pruned scan: events written date-partitioned (the layout
  // every 100 TB event table uses), read back with a date filter that
  // must resolve AT PLANNING TIME to 3 of 30 partition directories —
  // the scan never opens the other 27 files. The oracle computes the
  // same aggregate from the raw table; LayoutSpec asserts the plan
  // shape (PartitionFilters present, no pushed data filter needed, and
  // the scan's partition count equals the selected days).
  private val q102 = Q(
    "q102_partition_prune",
    (s, dir) => {
      val events = Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      // Scratch.dir (not deleteOnExit): the partitioned write fills the
      // dir, and File.delete() silently refuses non-empty directories —
      // each invocation would leak a full events-table copy in /tmp
      val scratch = graft.util.Scratch.dir("graft_part")
      val tableDir = s"$scratch/events_by_day"
      events.write.partitionBy("event_date").mode("overwrite")
        .parquet(tableDir)
      s.read.parquet(tableDir)
        .filter(col("event_date").between("2024-01-05", "2024-01-07"))
        .groupBy(col("event_date").cast("string").as("event_date"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double")
            .as("sum_value"))
        .orderBy(col("event_date"), col("event_type"))
    },
    Some("""
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN '2024-01-05' AND '2024-01-07'
      GROUP BY 1, 2
      ORDER BY event_date, event_type
    """))

  def all: Seq[Q] = Seq(q39, q54, q55, q84, q85, q102)
}
