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
      val scratch =
        java.nio.file.Files.createTempDirectory("graft_sink").toString
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

  def all: Seq[Q] = Seq(q39, q54, q55)
}
