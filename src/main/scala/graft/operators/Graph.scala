package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on entity graphs mined from the fact
  * tables. Complements [[Dedup]]'s min-label propagation (connected
  * components, q66) with PageRank-style importance scoring.
  *
  * INTEGER-EXACT fixed point: ranks are BIGINT multiples of 1e-12
  * (`Fp` = 10¹²), every step is integer multiply + `DIV` (never `/` —
  * Spark's slash on BIGINT is DOUBLE division, and a correctly-rounded
  * double quotient can truncate to a different integer than exact
  * floor division near boundaries), so the result is bit-identical in
  * any engine — double-based PageRank sums incoming contributions in
  * shuffle order, which no two engines (or two runs) agree on. The
  * deliberate cost is floor truncation: total rank mass decays by
  * < nodes·iterations ulps, irrelevant for ranking.
  *
  * Scale design: per iteration, contributions flow edge-wise via ONE
  * hash join of the rank table (O(nodes)) against the edge list
  * (O(edges), pre-distinct'd and persisted) followed by ONE
  * partial-combining sum on the destination. Ranks are
  * localCheckpoint'd each round — the lineage would otherwise double
  * per iteration (the q66 discipline).
  */
object Graph {

  val Fp = 1000000000000L // 10^12 fixed-point scale

  /** Undirected bipartite edge list (both directions) from a fact
    * table: nodes encode as 2·key (left side) and 2·key+1 (right).
    * Both directions come from ONE generator pass over the distinct
    * pairs — the union-of-two-projections form computes the distinct
    * (a full fact-table shuffle) twice, because the differing
    * projections defeat ReuseExchange. */
  def bipartiteEdges(facts: DataFrame, leftKey: String,
      rightKey: String): DataFrame = {
    val pairs = facts
      .select((col(leftKey) * 2).as("l"), (col(rightKey) * 2 + 1).as("r"))
      .distinct()
    pairs.select(explode(array(
        struct(col("l").as("src"), col("r").as("dst")),
        struct(col("r").as("src"), col("l").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** PageRank with damping `dampPct`/100 for `iterations` rounds over a
    * directed edge list (src, dst). Every node must have out-degree ≥ 1
    * (always true for undirected edge lists). Output: (node, rank_fp)
    * with Σ rank_fp ≈ Fp (floor-truncation deficit only). */
  def pageRank(edges: DataFrame, iterations: Int,
      dampPct: Int = 85, broadcastMaxNodes: Long = 1000000L): DataFrame = {
    // broadcastMaxNodes sizing (r5 advice): the rank table broadcasts
    // FRESH each iteration and old copies linger until GC, so the
    // driver can briefly hold `iterations` copies at ~40 B/row live.
    // The 1M default bounds that at a few hundred MB worst-case on a
    // default driver; raise it only with driver memory to match
    // (≈ iterations · nodes · 40 B transient).
    // the raw edge list is read twice below (degree agg + the deg
    // join); persist it so the upstream pipeline (typically a
    // fact-table distinct) runs once, not once per consumer
    val e = edges.select(col("src"), col("dst"))
      .transform(graft.util.CacheScope.persist)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
      .transform(graft.util.CacheScope.persist)
    // degree rides the edge list: one persisted (src, dst, deg) frame
    // makes each iteration a single join + sum instead of two joins.
    // repartition(src) BEFORE the persist: the cached partitioning is
    // visible to Catalyst, so the per-iteration rank join exchanges
    // only the O(nodes) rank table — the O(edges) side, the loop
    // invariant, is never re-shuffled or re-sorted
    val eDeg = e.join(deg, e("src") === deg("node"))
      .select(col("src"), col("dst"), col("deg"))
      .transform(graft.util.CacheScope.persist)
    val nNodes = deg.count() // materializes the persisted degree table
    // driver-side exact integer floors — literals in the plan, and the
    // oracle recomputes the same (100-d)·Fp // (100·n) and Fp // n
    val base = (100L - dampPct) * Fp / (100L * nNodes)
    val r0 = Fp / nNodes

    // the rank table is O(nodes) — orders of magnitude below the edge
    // list — so when it provably fits (nNodes is known on the driver)
    // it broadcasts into the edge join: the O(edges) loop invariant is
    // never exchanged OR sorted per iteration (the hash-join form
    // re-sorted the cached edge frame every round under SMJ). Above
    // `broadcastMaxNodes` (~16 MB of raw (node, rank) rows at the 1M
    // default — see the sizing note above) the hint is omitted and the
    // planner's shuffled hash join takes over — a runtime degrade, not
    // a code edit.
    val hintRanks: DataFrame => DataFrame =
      if (nNodes <= broadcastMaxNodes) df => broadcast(df) else identity
    // nodes with NO in-edges read exactly the teleport base every
    // iteration (the old form's left join + coalesce(0) said the same
    // thing row by row) — that set is LOOP-INVARIANT, so it is derived
    // once here and unioned into each iteration's ranks, deleting a
    // per-iteration O(nodes) join + its exchange from the loop body
    // (r18 optimization; bit-identical — sums of integers are
    // order-independent — GraphSpec pins it against the join form on a
    // directed graph with a source node). Undirected edge lists make
    // this frame EMPTY and the union branch a no-op scan.
    val noInRanks = deg.select(col("node"))
      .join(e.select(col("dst")).distinct(),
        col("node") === col("dst"), "left_anti")
      .select(col("node"), lit(base).as("rank_fp"))
      .transform(graft.util.CacheScope.persist)
    var ranks = deg.select(col("node"), lit(r0).as("rank_fp"))
    var lastCheckpoint: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val contribs = hintRanks(ranks)
        .join(eDeg, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank_fp DIV deg")).as("in_sum"))
      // in_sum is never null for a dst that received a contribution,
      // and every other node is in noInRanks — the union IS the old
      // left join's row set
      ranks = contribs
        .select(col("dst").as("node"),
          (lit(base) +
            expr(s"($dampPct * in_sum) DIV 100"))
            .as("rank_fp"))
        .unionByName(noInRanks)
      // truncate lineage every few rounds, not every round: each
      // checkpoint is an extra eager job, and a 4-deep join chain is
      // well within planner comfort — only unbounded growth (the q66
      // lesson) needs cutting. The SUPERSEDED checkpoint (4 rounds
      // back, now dead lineage) is freed eagerly once the new one has
      // materialized from it — its blocks bypass the CacheManager and
      // would otherwise wait for a driver GC. The final checkpoint
      // stays: the returned frame computes from it.
      if (i % 4 == 0 && i < iterations) {
        val cp = ranks.localCheckpoint() // eager: materializes first
        lastCheckpoint.foreach(
          org.apache.spark.sql.graft.Bridge.unpersistCheckpoint)
        lastCheckpoint = Some(cp)
        ranks = cp
      }
    }
    ranks
  }
}
