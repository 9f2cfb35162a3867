package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Shared-span detection + redaction (Dedup.sharedSpans /
  * redactSharedSpans) — the word-granular substring-dedup family. */
class SharedSpanSpec extends SparkSpec {

  private def S(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("one shared 15-word span: exact pair, positions, and length") {
    val s = spark
    import s.implicits._
    val shared = S("s", 15)
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"), // span at words 4..18
      (2L, s"b1 $shared b2 b3"))       // span at words 2..16
      .toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(spans == Seq((1L, 2L, 4L, 2L, 15L)))
  }

  test("minSpan filters: an 8-word overlap never reports at minSpan=12") {
    val s = spark
    import s.implicits._
    val shared = S("t", 8)
    val docs = Seq(
      (1L, s"a1 $shared a2"),
      (2L, s"b1 b2 $shared"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSpans(docs, "doc_id", "text",
      k = 3, minSpan = 12, maxDf = 20).isEmpty)
  }

  test("maxDf excludes boilerplate anchors: df over cap yields no span") {
    val s = spark
    import s.implicits._
    val shared = S("u", 12)
    // the same 12-word run in FIVE docs: every anchor has df=5 > maxDf=3
    val docs = (1L to 5L).map(i => (i, s"p$i $shared q$i"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSpans(docs, "doc_id", "text",
      k = 3, minSpan = 12, maxDf = 3).isEmpty)
    // raising the cap reports all 10 pairs
    assert(Dedup.sharedSpans(docs, "doc_id", "text",
      k = 3, minSpan = 12, maxDf = 5).count() == 10L)
  }

  test("gap on the same diagonal splits into two maximal spans") {
    val s = spark
    import s.implicits._
    val s1 = S("g", 12); val s2 = S("h", 12)
    val docs = Seq(
      (8L, s"$s1 e1 $s2"),
      (9L, s"$s1 f1 $s2"))
      .toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20)
      .orderBy("start_a")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(spans == Seq((1L, 1L, 12L), (14L, 14L, 12L)))
  }

  test("redaction: larger id loses the span words, smaller stays intact") {
    val s = spark
    import s.implicits._
    val shared = S("s", 15)
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 $shared b2 b3"))
      .toDF("doc_id", "text")
    val out = Dedup.redactSharedSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, s"a1 a2 a3 $shared a4 a5", 0L),
      (2L, "b1 b2 b3", 15L)))
  }

  test("stitching merges gap-split islands; wide gaps stay split") {
    val s = spark
    import s.implicits._
    val s1 = S("g", 12); val s2 = S("h", 12)
    // same diagonal, 1-word gap: q153 reports two 12-word spans,
    // the stitched form one 25-word region of 2 islands
    val docs = Seq(
      (8L, s"$s1 e1 $s2"),
      (9L, s"$s1 f1 $s2"))
      .toDF("doc_id", "text")
    val stitched = Dedup.sharedSpansStitched(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20, maxGap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(stitched == Seq((8L, 9L, 1L, 1L, 25L, 2L)))
    // maxGap 0 refuses the 1-word gap: two exact regions, each 1 island
    val strict = Dedup.sharedSpansStitched(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20, maxGap = 0)
      .orderBy("start_a")
      .collect().map(r => (r.getLong(2), r.getLong(4), r.getLong(5))).toSeq
    assert(strict == Seq((1L, 12L, 1L), (14L, 12L, 1L)))
  }

  test("stitched ≡ exact spans when every island already stands alone") {
    val s = spark
    import s.implicits._
    val shared = S("s", 15)
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 $shared b2 b3"))
      .toDF("doc_id", "text")
    val st = Dedup.sharedSpansStitched(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20, maxGap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(st == Seq((1L, 2L, 4L, 2L, 15L, 1L)))
  }

  test("incremental ≡ batch recompute restricted to batch-touching pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(2L, 3L).foreach { mod =>
      val history = docs.filter(col("doc_id") % mod === 0)
      val batch = docs.filter(col("doc_id") % mod =!= 0)
      val index = Dedup.positionedShingleFps(history, "doc_id", "text", 5)
      val census = index.select(col("fp"), col("doc_id")).distinct()
        .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      val inc = Dedup.incrementalSharedSpans(index, census, batch,
          "doc_id", "text", k = 5, minSpan = 8, maxDf = 20)
        .orderBy("doc_a", "doc_b", "start_a", "start_b").collect().toSeq
      val full = Dedup.sharedSpans(docs, "doc_id", "text",
          k = 5, minSpan = 8, maxDf = 20)
        .filter(!(col("doc_a") % mod === 0 && col("doc_b") % mod === 0))
        .orderBy("doc_a", "doc_b", "start_a", "start_b").collect().toSeq
      assert(inc.nonEmpty, s"mod=$mod fixture found no spans — weak test")
      assert(inc == full, s"mod=$mod incremental diverged")
    }
  }

  test("incremental plan: stored index joins stay broadcast, no SMJ") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val index = Dedup.positionedShingleFps(history, "doc_id", "text", 5)
    val census = index.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val plan = Dedup.incrementalSharedSpans(index, census, batch,
        "doc_id", "text", k = 5, minSpan = 8, maxDf = 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "stored-side join fell off the broadcast path:\n" + plan)
  }

  test("overlapping spans from two partners redact each position once") {
    val s = spark
    import s.implicits._
    val w = (1 to 20).map(i => s"w$i")
    val docs = Seq(
      (5L, "c1 c2 " + w.take(12).mkString(" ")),      // shares w1..w12
      (6L, w.drop(7).mkString(" ") + " d1"),          // shares w8..w20
      (7L, w.mkString(" ")))                          // loses everything
      .toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20)
      .orderBy("doc_a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(spans == Seq((5L, 7L, 3L, 1L, 12L), (6L, 7L, 1L, 8L, 13L)))
    val out = Dedup.redactSharedSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 20)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // union of 1..12 and 8..20 covers doc 7 completely; the 5-word
    // overlap between docs 5 and 6 is below minSpan, so neither is cut
    assert(out(0)._3 == 0L && out(1)._3 == 0L)
    assert(out(2) == ((7L, "", 20L)))
  }

  test("redaction shuffle lane is bit-identical to the pinned broadcast") {
    val s = spark
    import s.implicits._
    val shared = S("s", 15)
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 $shared b2 b3"),
      (3L, s"c1 c2 $shared"),
      (4L, "d1 d2 d3 d4"))
      .toDF("doc_id", "text")
    def run(mode: String) = Dedup.redactSharedSpans(docs, "doc_id",
        "text", k = 3, minSpan = 12, maxDf = 20, removalJoin = mode)
    val bcast = run("broadcast").orderBy("doc_id").collect().toSeq
    // kill every automatic broadcast so "shuffle" truly exercises the
    // non-broadcast path — the 100 TB lane where the removal table is
    // corpus-proportional (crawl duplication incidence 30–50%)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeThreshold =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val shuffled = run("shuffle")
      val rows = shuffled.orderBy("doc_id").collect().toSeq
      assert(rows == bcast, "shuffle lane diverged from broadcast lane")
      // and the removal join really is NOT a broadcast: walk the
      // executed plan (AQE stages included) for the final left join
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case st: QueryStageExec => Seq(st.plan)
          case other => other.children
        }
        (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
      }
      val leftOuterBroadcasts =
        nodes(shuffled.queryExecution.executedPlan).collect {
          case j: BroadcastHashJoinExec
              if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j
        }
      assert(leftOuterBroadcasts.isEmpty,
        "removal join still broadcast under the shuffle pin")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      aqeThreshold match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("auto removal join picks broadcast when the removal set is small") {
    // the other half of the size gate: with default thresholds a
    // small removal table must land on the broadcast path at RUNTIME
    // (AQE stats), so document text never crosses an exchange
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.redactSharedSpans(docs, "doc_id", "text",
      k = 5, minSpan = 12, maxDf = 20)
    // materialize THIS queryExecution (count() would spawn a separate
    // one and leave this plan's AQE un-finalized at the initial SMJ)
    out.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case st: QueryStageExec => Seq(st.plan)
        case other => other.children
      }
      (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
    }
    val leftOuterJoins = nodes(out.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j
    }
    assert(leftOuterJoins.nonEmpty, "removal join not found in plan")
    assert(leftOuterJoins.forall(_.isInstanceOf[BroadcastHashJoinExec]),
      "small removal table must broadcast under the auto gate:\n" +
        leftOuterJoins.mkString("\n"))
  }

  test("hot-span clusters: over-cap df reports with keeper election") {
    val s = spark
    import s.implicits._
    val hot = S("u", 14)
    val rare = S("v", 12)
    // the 14-word quote sits in FIVE docs (df=5 for every interior
    // shingle — over a pair cap of 3, so sharedSpans at maxDf=3 is
    // blind to it); the 12-word run sits in only two
    val docs = ((1L to 5L).map(i => (i, s"p$i $hot q$i")) ++
      Seq((6L, s"x1 $rare x2"), (7L, s"y1 y2 $rare")))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSpans(docs, "doc_id", "text",
      k = 3, minSpan = 12, maxDf = 3)
      .filter(col("doc_a") <= 5).isEmpty)
    val clusters = Dedup.hotSpanClusters(docs, "doc_id", "text",
        k = 3, minSpan = 12, minDf = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    // one cluster of five occurrences, keeper = smallest doc id;
    // the df=2 span is under minDf and absent
    assert(clusters == (1L to 5L).map(i => (i, 2L, 14L, 5L, i == 1L)))
    val sigs = Dedup.hotSpanClusters(docs, "doc_id", "text",
        k = 3, minSpan = 12, minDf = 4)
      .select("span_sig").distinct().count()
    assert(sigs == 1L, "identical runs must share one signature")
  }

  test("redactHotSpans keeps the keeper intact and cuts every copy") {
    val s = spark
    import s.implicits._
    val hot = S("u", 14)
    val docs = (1L to 5L).map(i => (i, s"p$i $hot q$i"))
      .toDF("doc_id", "text")
    val out = Dedup.redactHotSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, minDf = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.head == ((1L, s"p1 $hot q1", 0L)))
    assert(out.tail == (2L to 5L).map(i => (i, s"p$i q$i", 14L)))
  }

  test("hot runs split by a cold shingle form distinct clusters") {
    val s = spark
    import s.implicits._
    val h1 = S("a", 12); val h2 = S("b", 12)
    // h1 and h2 are hot (3 docs each) but the middle word differs per
    // doc, so no doc carries one contiguous all-hot run across both
    val docs = Seq(
      (1L, s"$h1 m1 $h2"),
      (2L, s"$h1 m2 $h2"),
      (3L, s"$h1 m3 $h2"))
      .toDF("doc_id", "text")
    val got = Dedup.hotSpanClusters(docs, "doc_id", "text",
        k = 3, minSpan = 12, minDf = 3)
      .groupBy("span_sig")
      .agg(count(lit(1)).as("n"), min("start_pos").as("st"))
      .orderBy("st")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((3L, 1L), (3L, 14L)),
      "expected two 3-copy clusters at positions 1 and 14")
  }

  test("incremental winnow pairs ≡ recompute on batch-touching pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(2L, 3L).foreach { mod =>
      val history = docs.filter(col("doc_id") % mod === 0)
      val batch = docs.filter(col("doc_id") % mod =!= 0)
      val index = Dedup.winnowFingerprints(history, "doc_id", "text",
        k = 3, windowW = 4)
      val inc = Dedup.incrementalWinnowPairs(index, batch, "doc_id",
          "text", k = 3, windowW = 4, minShared = 2)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val full = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
          k = 3, windowW = 4, minShared = 2)
        .filter(!(col("doc_a") % mod === 0 && col("doc_b") % mod === 0))
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(inc.nonEmpty, s"mod=$mod fixture found no pairs — weak test")
      assert(inc == full, s"mod=$mod incremental diverged")
    }
  }

  test("winnowed propose-verify spans ≡ exact spans on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.sharedSpans(docs, "doc_id", "text",
        k = 5, minSpan = 12, maxDf = 20)
      .orderBy("doc_a", "doc_b", "start_a", "start_b").collect().toSeq
    val pv = Dedup.winnowedSharedSpans(docs, "doc_id", "text",
        k = 5, minSpan = 12, maxDf = 20, windowW = 4, minShared = 2)
      .orderBy("doc_a", "doc_b", "start_a", "start_b").collect().toSeq
    assert(exact.nonEmpty, "fixture found no spans — weak test")
    assert(pv == exact,
      "propose stage dropped spans the exact form reports")
  }

  test("winnowed propose-verify: the named miss class is the SHORT quote") {
    val s = spark
    import s.implicits._
    // a 12-word shared run: reported by the exact form, and long
    // enough (≥ w+k−1 = 8 words) that the winnowing guarantee forces
    // ≥1 shared selection — but minShared=1000 makes the propose
    // stage unreachable, proving spans only ever come from PROPOSED
    // pairs (the candidate restriction is real, not decorative)
    val shared = S("s", 12)
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4"),
      (2L, s"b1 $shared b2"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSpans(docs, "doc_id", "text",
      k = 5, minSpan = 12, maxDf = 20).count() == 1L)
    assert(Dedup.winnowedSharedSpans(docs, "doc_id", "text",
      k = 5, minSpan = 12, maxDf = 20, windowW = 4,
      minShared = 1).count() == 1L)
    assert(Dedup.winnowedSharedSpans(docs, "doc_id", "text",
      k = 5, minSpan = 12, maxDf = 20, windowW = 4,
      minShared = 1000).isEmpty)
  }

  test("incremental hot spans ≡ full recompute; newly-hot cluster flips") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val flips = Seq(2L, 3L).map { mod =>
      val history = docs.filter(col("doc_id") % mod === 0)
      val batch = docs.filter(col("doc_id") % mod =!= 0)
      val index = Dedup.positionedShingleFps(history, "doc_id", "text", 5)
      val census = index.select(col("fp"), col("doc_id")).distinct()
        .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      val ledger = Dedup.hotSpanLedger(history, "doc_id", "text",
        k = 5, minSpan = 12, minDf = 3)
      val inc = Dedup.incrementalHotSpanClusters(index, census, ledger,
          batch, "doc_id", "text", k = 5, minSpan = 12, minDf = 3)
        .orderBy("doc_id", "start_pos").collect().toSeq
      val full = Dedup.hotSpanClusters(docs, "doc_id", "text",
          k = 5, minSpan = 12, minDf = 3)
        .orderBy("doc_id", "start_pos").collect().toSeq
      assert(full.nonEmpty, s"mod=$mod fixture found no hot spans")
      assert(inc == full, s"mod=$mod incremental diverged")
      // hotness flip probe: docs reported by the merge that were NOT
      // hot-span docs of the history alone (their cluster crossed
      // minDf only with the batch)
      val historyOnly = Dedup.hotSpanClusters(history, "doc_id", "text",
          k = 5, minSpan = 12, minDf = 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      (inc.map(_.getLong(1)).toSet -- historyOnly).nonEmpty
    }
    // at least one of the two splits must genuinely flip hotness
    // across the boundary, or the merge arm is untested
    assert(flips.contains(true),
      "no split exercises the newly-hot flip — weak fixture")
  }

  test("incremental hot spans: shuffle lane bit-identical, no doc_id pin") {
    // The affected-doc frames (affected / pos / present) are newly-hot-
    // incidence-proportional, so none of their joins may carry a
    // broadcast pin — with auto-broadcast killed, every one of them
    // must execute as a shuffle join and produce the SAME rows.
    val s = spark
    import s.implicits._
    val h = S("h", 14) // df 2 in history, 3 with batch → newly hot
    val g = S("g", 14) // df 3 in history → already hot, runs kept
    val history = Seq(
      (1L, s"a1 $h a2"), (2L, s"b1 b2 $h"),
      (3L, s"c1 $g"), (4L, s"$g d1 d2"), (5L, s"e1 $g e2"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, s"x1 x2 $h x3")).toDF("doc_id", "text")
    val index = Dedup.positionedShingleFps(history, "doc_id", "text", 3)
    val census = index.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val ledger = Dedup.hotSpanLedger(history, "doc_id", "text",
      k = 3, minSpan = 12, minDf = 3)
    def run() = Dedup.incrementalHotSpanClusters(index, census, ledger,
      batch, "doc_id", "text", k = 3, minSpan = 12, minDf = 3)
    val auto = run().orderBy("doc_id", "start_pos").collect().toSeq
    // both lanes must be present or the fixture proves nothing:
    // newly-hot h recomputes (docs 1,2,10), already-hot g keeps (3,4,5)
    assert(auto.map(_.getLong(1)).toSet == Set(1L, 2L, 3L, 4L, 5L, 10L))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeThreshold =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val shuffled = run()
      val rows = shuffled.orderBy("doc_id", "start_pos").collect().toSeq
      assert(rows == auto, "shuffle lane diverged from auto lane")
      // surviving broadcasts must be ONLY the batch-proportional fp
      // pins (bCensus / newlyHot semi-joins) — a broadcast keyed on
      // doc_id means an incidence-proportional frame got pinned
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case st: QueryStageExec => Seq(st.plan)
          case other => other.children
        }
        (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
      }
      val docIdBroadcasts =
        nodes(shuffled.queryExecution.executedPlan).collect {
          case j: BroadcastHashJoinExec if j.leftKeys.exists(
            _.references.exists(_.name == "doc_id")) => j
        }
      assert(docIdBroadcasts.isEmpty,
        "a doc_id-keyed join is still pinned broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      aqeThreshold match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("union redaction cuts rare pairs AND hot clusters in one pass") {
    val s = spark
    import s.implicits._
    val rare = S("r", 12) // df=2 → pair lane
    val hot = S("u", 14)  // df=4 → cluster lane (over maxDf=2)
    val docs = Seq(
      (1L, s"a1 $rare a2"),
      (2L, s"b1 b2 $rare"),
      (3L, s"c1 $hot c2"),
      (4L, s"d1 $hot d2"),
      (5L, s"e1 $hot e2"),
      (6L, s"f1 $hot $rare")) // hot AND rare? rare now df=3 — adjust
      .toDF("doc_id", "text")
    // rare appears in docs 1,2,6 → df=3 ≥ minDf: it moves to the hot
    // lane entirely; hot is in 3,4,5,6 → df=4. Keepers: smallest ids.
    val out = Dedup.redactAllSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 2, minDf = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out(0) == ((1L, s"a1 $rare a2", 0L)), "rare keeper intact")
    assert(out(1) == ((2L, "b1 b2", 12L)), "rare copy cut")
    assert(out(2) == ((3L, s"c1 $hot c2", 0L)), "hot keeper intact")
    assert(out(3) == ((4L, "d1 d2", 14L)) &&
      out(4) == ((5L, "e1 e2", 14L)), "hot copies cut")
    assert(out(5) == ((6L, "f1", 26L)),
      "doc carrying BOTH spans loses both (neither keeper)")
  }

  test("union redaction: genuinely-pairwise span still cuts via pair lane") {
    val s = spark
    import s.implicits._
    val rare = S("p", 12)
    val docs = Seq(
      (1L, s"a1 $rare a2"),
      (2L, s"b1 b2 $rare"),
      (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val out = Dedup.redactAllSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 2, minDf = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((1L, 0L), (2L, 12L), (3L, 0L)))
    // lane boundary respected: minDf must exceed maxDf
    intercept[IllegalArgumentException] {
      Dedup.redactAllSpans(docs, "doc_id", "text",
        k = 3, minSpan = 12, maxDf = 3, minDf = 3)
    }
  }

  test("incremental winnow plan: stored index never sort-merge joins") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val index = Dedup.winnowFingerprints(history, "doc_id", "text",
      k = 3, windowW = 4)
    val plan = Dedup.incrementalWinnowPairs(index, batch, "doc_id",
        "text", k = 3, windowW = 4, minShared = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "stored-side join fell off the broadcast path:\n" + plan)
  }
}
