package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryPack, Tables}
import graft.operators.Graph

/** Graph-analytics family: iterative PageRank over the part–supplier
  * bipartite graph mined from lineitem. Integer fixed-point arithmetic
  * end to end (BIGINT `DIV`, never double division), so three unrolled
  * CTE iterations in DuckDB reproduce the Spark loop bit-for-bit —
  * same discipline as q36/q76's integer-exact k-means.
  */
object GraphQueries extends QueryPack {

  // ---------------------------------------------------------------- q95
  // 3-iteration PageRank, top 20 nodes. Suppliers (high degree) should
  // dominate parts — the ranking itself is the regression check.
  private val q95 = Q(
    "q95_pagerank",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val edges = Graph.bipartiteEdges(Tables(s, dir, "lineitem"),
        "l_partkey", "l_suppkey")
      val ord = Seq(col("rank_fp").desc, col("node").asc)
      Graph.pageRank(edges, iterations = 3)
        .orderBy(ord: _*)
        .limit(20)
        .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
        .select(
          when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
            .as("node_type"),
          expr("node DIV 2").as("key"),
          col("rank_fp"), col("rnk"))
        .orderBy(col("rnk"))
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT l_partkey * 2 AS l, l_suppkey * 2 + 1 AS r
        FROM lineitem),
      edges AS (
        SELECT l AS src, r AS dst FROM pairs
        UNION ALL
        SELECT r AS src, l AS dst FROM pairs),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
      meta AS (SELECT COUNT(*) AS n FROM deg),
      r0 AS (
        SELECT node, CAST(1000000000000 // n AS BIGINT) AS rank_fp
        FROM deg, meta),
      i1 AS (
        SELECT d.node,
               CAST((15 * 1000000000000) // (100 * m.n)
                    + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank_fp
        FROM deg d CROSS JOIN meta m
        LEFT JOIN (
          SELECT e.dst, SUM(r.rank_fp // dd.deg) AS in_sum
          FROM r0 r
          JOIN deg dd ON dd.node = r.node
          JOIN edges e ON e.src = r.node
          GROUP BY e.dst) s ON s.dst = d.node),
      i2 AS (
        SELECT d.node,
               CAST((15 * 1000000000000) // (100 * m.n)
                    + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank_fp
        FROM deg d CROSS JOIN meta m
        LEFT JOIN (
          SELECT e.dst, SUM(r.rank_fp // dd.deg) AS in_sum
          FROM i1 r
          JOIN deg dd ON dd.node = r.node
          JOIN edges e ON e.src = r.node
          GROUP BY e.dst) s ON s.dst = d.node),
      i3 AS (
        SELECT d.node,
               CAST((15 * 1000000000000) // (100 * m.n)
                    + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank_fp
        FROM deg d CROSS JOIN meta m
        LEFT JOIN (
          SELECT e.dst, SUM(r.rank_fp // dd.deg) AS in_sum
          FROM i2 r
          JOIN deg dd ON dd.node = r.node
          JOIN edges e ON e.src = r.node
          GROUP BY e.dst) s ON s.dst = d.node)
      SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
             node // 2 AS key, rank_fp, CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT node, rank_fp,
               ROW_NUMBER() OVER (ORDER BY rank_fp DESC, node ASC) AS rnk
        FROM i3)
      WHERE rnk <= 20
      ORDER BY rnk
    """))

  // --------------------------------------------------------------- q115
  // 9-iteration PageRank over the (much smaller) customer–nation
  // bipartite graph. Exists to run the iterative machinery DEEP enough
  // that the lineage-truncation branch executes under the gate: at
  // i=4 the ranks are localCheckpoint'd, and at i=8 a SECOND checkpoint
  // supersedes the first, whose blocks are freed eagerly
  // (Graph.scala's `i % 4` branch + Bridge.unpersistCheckpoint) — q95's
  // 3-iteration registration never reaches either. The small graph
  // (O(customers) edges, not O(lineitem)) keeps the 9 unrolled oracle
  // iterations cheap in DuckDB and the bench cost flat.
  private def prIterSql(name: String, prev: String): String =
    s"""      $name AS (
       |        SELECT d.node,
       |               CAST((15 * 1000000000000) // (100 * m.n)
       |                    + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank_fp
       |        FROM deg d CROSS JOIN meta m
       |        LEFT JOIN (
       |          SELECT e.dst, SUM(r.rank_fp // dd.deg) AS in_sum
       |          FROM $prev r
       |          JOIN deg dd ON dd.node = r.node
       |          JOIN edges e ON e.src = r.node
       |          GROUP BY e.dst) s ON s.dst = d.node)""".stripMargin

  private val deepIters = 9

  private val q115 = Q(
    "q115_pagerank_deep",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // a fifth of the customers: checkpoint ROTATION is an
      // iteration-count property, not a graph-size property — the
      // slimmer graph keeps the 9 per-iteration shuffle rounds (the
      // genuine cost of deep iteration) from dominating the bench
      val edges = Graph.bipartiteEdges(
        Tables(s, dir, "customer").filter(col("c_custkey") % 5 === 0),
        "c_custkey", "c_nationkey")
      val ord = Seq(col("rank_fp").desc, col("node").asc)
      Graph.pageRank(edges, iterations = deepIters)
        .orderBy(ord: _*)
        .limit(20)
        .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
        .select(
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("nation"))
            .as("node_type"),
          expr("node DIV 2").as("key"),
          col("rank_fp"), col("rnk"))
        .orderBy(col("rnk"))
    },
    Some {
      // same CTE shape as q95, unrolled by loop instead of by hand —
      // the iteration body is the single source of truth
      val iters = (1 to deepIters)
        .map(i => prIterSql(s"i$i", if (i == 1) "r0" else s"i${i - 1}"))
        .mkString(",\n")
      s"""
      WITH pairs AS (
        SELECT DISTINCT c_custkey * 2 AS l, c_nationkey * 2 + 1 AS r
        FROM customer WHERE c_custkey % 5 = 0),
      edges AS (
        SELECT l AS src, r AS dst FROM pairs
        UNION ALL
        SELECT r AS src, l AS dst FROM pairs),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
      meta AS (SELECT COUNT(*) AS n FROM deg),
      r0 AS (
        SELECT node, CAST(1000000000000 // n AS BIGINT) AS rank_fp
        FROM deg, meta),
$iters
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'nation' END AS node_type,
             node // 2 AS key, rank_fp, CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT node, rank_fp,
               ROW_NUMBER() OVER (ORDER BY rank_fp DESC, node ASC) AS rnk
        FROM i$deepIters)
      WHERE rnk <= 20
      ORDER BY rnk
    """
    })

  def all: Seq[Q] = Seq(q95, q115)
}
