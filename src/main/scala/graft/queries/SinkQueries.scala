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

  def all: Seq[Q] = Seq(q39)
}
