package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("pagerank: symmetric two-node graph ranks equally") {
    val s = spark
    import s.implicits._
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) == ranks(1L))
    // two symmetric nodes keep their initial half share (minus floors)
    assert(math.abs(ranks(0L) - Graph.Fp / 2) <= 2)
  }

  test("pagerank: rank mass is conserved up to floor truncation") {
    val edges = Graph.bipartiteEdges(lineitem, "l_partkey", "l_suppkey")
    val ranks = Graph.pageRank(edges, iterations = 3)
    val total = ranks.agg(sum("rank_fp")).collect().head.getLong(0)
    assert(total <= Graph.Fp)
    // the DIV floors lose up to deg-1 per node's outflow per round —
    // still parts-per-million of Fp; anything above 0.01% is a real
    // conservation bug, not truncation
    assert(total >= Graph.Fp - Graph.Fp / 10000,
      s"rank mass $total decayed more than floor truncation allows")
  }

  test("pagerank: high-degree suppliers outrank parts") {
    val edges = Graph.bipartiteEdges(lineitem, "l_partkey", "l_suppkey")
    val top = Graph.pageRank(edges, iterations = 3)
      .orderBy(col("rank_fp").desc, col("node").asc)
      .limit(10).collect()
    // suppliers are odd-encoded and have ~100x the part degree
    top.foreach(r => assert(r.getLong(0) % 2 == 1,
      s"expected suppliers on top, got node ${r.getLong(0)}"))
  }

  test("pagerank: superseded checkpoint blocks are freed, not accumulated") {
    // 9 iterations → localCheckpoint at i=4, superseded + eagerly freed
    // at i=8 (Graph.scala's `i % 4` branch). After the CacheScope
    // unwinds the operator-internal persists, at most ONE extra RDD —
    // the live i=8 checkpoint — may remain registered. Two would mean
    // the eager free regressed to GC-time cleanup.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    graft.util.CacheScope.withScope {
      val ranks = Graph.pageRank(
        Graph.bipartiteEdges(
          spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
          "c_custkey", "c_nationkey"),
        iterations = 9)
      assert(ranks.count() > 0)
    }
    // unpersists are non-blocking — poll until the drops land
    val deadline = System.currentTimeMillis + 30000
    def extra = (sc.getPersistentRDDs.keySet -- before).size
    while (extra > 1 && System.currentTimeMillis < deadline)
      Thread.sleep(200)
    assert(extra <= 1,
      s"expected at most the live checkpoint to stay registered, got $extra")
  }

  test("pagerank: directed graph with a rank source ≡ per-iteration left-join reference") {
    // Pins the r18 loop-invariant no-in-edge union against the
    // original deg-LEFT-JOIN-contribs form it replaced, on the shape
    // where they could diverge: a DIRECTED graph with a node that has
    // out-edges but no in-edges (node 0 — it must hold exactly the
    // teleport base every iteration).
    val s = spark
    import s.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val iters = 3
    val got = Graph.pageRank(edges, iterations = iters)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // reference: the pre-r18 loop body, inlined
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
    val eDeg = e.join(deg, e("src") === deg("node"))
      .select(col("src"), col("dst"), col("deg"))
    val n = deg.count()
    val base = 15L * Graph.Fp / (100L * n)
    var ranks = deg.select(col("node"), lit(Graph.Fp / n).as("rank_fp"))
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(eDeg, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank_fp DIV deg")).as("in_sum"))
      ranks = deg.select(col("node"))
        .join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(in_sum, 0L)) DIV 100"))
            .as("rank_fp"))
    }
    val ref = ranks.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ref, s"union form ≠ left-join reference\n got=$got\n ref=$ref")
    // and the source node holds exactly the base
    assert(got.head == ((0L, base)), s"source node drifted: ${got.head}")
  }

  test("pagerank: invariant to input partitioning (integer-exact)") {
    val edges = Graph.bipartiteEdges(lineitem, "l_partkey", "l_suppkey")
    val a = Graph.pageRank(edges, iterations = 2)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges.repartition(7), iterations = 2)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }
}
