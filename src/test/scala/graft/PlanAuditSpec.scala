package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan audit: no registered query may plan an
  * unbounded all-pairs join. CartesianProduct and
  * BroadcastNestedLoopJoin are the two shapes that stop scaling at
  * 100 TB. Three audited exceptions, all cross joins whose build side
  * is a broadcast of CONSTANT size (cost linear in n, not n²):
  * q20's brute-force baseline (n × the bounded query set), q36's
  * IVF assignment (n × the ≤ numCentroids codebook), q68's
  * corpus-constant fan-in (vocab × the ONE-row distinct-source count —
  * a literal-key equi-join constant-folds to this same shape), q73's
  * two corpus-constant fans (the 1-row total and the 1-row boilerplate
  * vocabulary array), q75's int8 re-run of the q20 baseline (n × the
  * bounded query set), q76's k-means machinery (n × the ≤
  * numCentroids codebook, q36's class), q91's 1-row bigram-total
  * fan (q68/q73's corpus-constant class), and q106's 1-row
  * (n_docs, avgdl) fan (same class).
  */
class PlanAuditSpec extends SparkSpec {

  private val boundedCrossJoinAllowed =
    Set("q20_ann_bruteforce", "q36_ann_ivf", "q68_tfidf_keywords",
      "q73_boilerplate_scrub", "q75_ann_int8", "q76_semantic_dedup",
      "q80_ann_binary_rescore", "q81_column_profile",
      "q91_bigram_collocations",
      // q106's 1-row (n_docs, avgdl) broadcast fan — q68/q91's
      // corpus-constant class
      "q106_bm25_search",
      // q110's ≤ numCentroids codebook fan — q36/q76's bounded class
      "q110_incremental_ivf",
      // q118's n × bounded-query-panel scan — q20/q75's bounded class
      // (the positives anti-join stays an equi-join, not a cross)
      "q118_hard_negatives",
      // q120's 1-row corpus-total fan — q68/q91/q106's constant class
      "q120_token_balanced_shards")

  test("no query plans CartesianProduct or BroadcastNestedLoopJoin") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if boundedCrossJoinAllowed(name) => None
      // q30/q49/q86/q99 drive streaming queries (evaluating them here
      // would run the whole stream); batch twins q12/q38/q03/q08 ARE
      // audited
      case (name, _) if name == "q30_stream_hourly" ||
        name == "q49_stream_stream_join" ||
        name == "q86_stream_static_enrich" ||
        name == "q99_stream_dedup" ||
        name == "q103_stream_outer_join" ||
        name == "q105_stream_sessionize" => None
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded all-pairs joins in: ${offenders.mkString(", ")}")
  }

  test("q82 plans the native KMV aggregate, not the distinct+window chain") {
    val plan = SparkEntry.queries("q82_kmv_distinct")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("kmv_sketch"),
      "q82 must aggregate through KmvSketchAgg")
    assert(plan.contains("ObjectHashAggregate"),
      "the typed aggregate must ride the hash-agg fast path")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("row_number"),
      "composed WindowGroupLimit chain resurfaced in q82")
  }

  test("q92 plans the bounded posting aggregate on the hash-agg path") {
    val plan = SparkEntry.queries("q92_inverted_index")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("bounded_min_set"),
      "q92 must build postings through BoundedMinSetAgg")
    assert(!plan.contains("collect_set"),
      "unbounded collect_set buffer resurfaced in q92")
    assert(plan.contains("ObjectHashAggregate"),
      "the typed aggregate must ride the hash-agg fast path")
  }
}
