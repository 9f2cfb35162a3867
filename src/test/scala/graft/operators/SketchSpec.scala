package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Portable sketches: KMV distinct estimation and RNG-free priority
  * sampling. */
class SketchSpec extends SparkSpec {

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("KMV: sketch size = min(k, exact); estimates within 50% on real data") {
    val r = Sketch.kmvDistinct(orders, "o_orderpriority", "o_custkey", 64)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (nSketch, exact) = (row.getLong(1), row.getLong(4))
      assert(nSketch === math.min(64L, exact))
      assert(row.getBoolean(5), s"estimate out of bounds: $row")
    }
  }

  test("KMV: a group smaller than k estimates exactly") {
    val s = spark
    import s.implicits._
    val tiny = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L)).toDF("grp", "v")
    val row = Sketch.kmvDistinct(tiny, "grp", "v", 64).collect().head
    assert(row.getLong(1) === 3L)
    assert(row.getDouble(3) === 3.0)
    assert(row.getLong(4) === 3L)
  }

  test("priority sample: deterministic, scale-invariant in weights, ranked 1..n") {
    val base = docs.select(col("doc_id"), col("n_chars"))
    val a = Sketch.prioritySample(base, "doc_id", "n_chars", 50)
      .select("doc_id", "rnk").collect()
    assert(a.map(_.getInt(1)).sorted.toSeq === (1 to 50))
    val b = Sketch.prioritySample(base, "doc_id", "n_chars", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.map(_.getLong(0)).toSet === b)
    // multiplying every weight by a constant scales every priority by
    // the same constant: identical sample
    val scaled = Sketch.prioritySample(
        base.withColumn("n_chars", col("n_chars") * 7),
        "doc_id", "n_chars", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scaled === b)
  }

  test("priority sample over-represents heavy rows") {
    val base = docs.select(col("doc_id"), col("n_chars"))
    val corpusAvg = base.agg(avg("n_chars")).collect().head.getDouble(0)
    val sampleAvg = Sketch.prioritySample(base, "doc_id", "n_chars", 100)
      .agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleAvg > corpusAvg,
      s"sample avg $sampleAvg ≤ corpus avg $corpusAvg")
  }

  test("CMS: every estimate overestimates (collisions only inflate)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"))
    // top every key (there are only ~15 at this sf): the invariant must
    // hold for all of them, not just the heavy ones
    val r = Sketch.cmsHeavyHitters(ev, "user_id", d = 4, w = 1024, topN = 1000)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Boolean]("overestimates"),
        s"CMS must never underestimate: $row")
      assert(row.getAs[Long]("est_cnt") >= row.getAs[Long]("exact_cnt"))
    }
  }

  test("CMS: estimates are tight when keys are sparse in the matrix") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"))
    val n = ev.count()
    // 15 keys hashed into 4x1024 cells: the standard error bound
    // (2N/w per row, min over 4 rows) is loose here but cheap to pin
    val r = Sketch.cmsHeavyHitters(ev, "user_id", d = 4, w = 1024, topN = 10)
      .collect()
    r.foreach { row =>
      val slack = row.getAs[Long]("est_cnt") - row.getAs[Long]("exact_cnt")
      assert(slack <= 2 * n / 1024,
        s"estimate slack $slack above the CMS bound for $row")
    }
  }

  test("CMS: matrix build shuffles at most d*w counters per task, not the corpus") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"))
    // the exchange below the (i, b) aggregation carries partial counts:
    // bounded by tasks * d * w, and far below corpus * d exploded rows
    val plan = Sketch.cmsHeavyHitters(ev, "user_id", 4, 1024, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }

  test("priority sample plans TakeOrderedAndProject, not a corpus-wide window") {
    val plan = Sketch.prioritySample(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("KMV source overlap: exact when k covers the universe, estimates track exact Jaccard") {
    val s = spark
    import s.implicits._
    // tiny universe, k = 64 >> |shingles|: the sketch IS the full set,
    // so every estimate must be EXACT set arithmetic
    val tiny = Seq(
      ("sa", "a b c d e f"),   // shingles: {abc, bcd, cde, def}
      ("sb", "a b c d x y"),   // {abc, bcd, cdx, dxy} — 2 shared
      ("sc", "p q r s t u"))   // disjoint
      .toDF("source", "text")
    val r = Sketch.kmvSourceOverlap(tiny, "source", "text", 3, 64)
      .collect().map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    val ab = r(("sa", "sb"))
    assert(ab._1 == 6L && ab._2 == 2L) // union 6, shared 2
    assert(math.abs(ab._3 - 2.0 / 6.0) < 1e-12)
    assert(ab._4 == 6.0) // below-k union estimates exactly
    val ac = r(("sa", "sc"))
    assert(ac._2 == 0L && ac._3 == 0.0)
    // real corpus: estimates must track q128's exact overlap — compare
    // the estimated Jaccard to the exact one per pair, k=64
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val est = Sketch.kmvSourceOverlap(docsDf, "source", "text", 3, 64)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(4))
      .toMap
    val sh = Dedup.explodedShingles(docsDf, "source", "text", 3)
      .collect().groupBy(_.getString(0))
      .map { case (k2, v) => k2 -> v.map(_.getString(1)).toSet }
    val errs = for (((a, b), je) <- est.toSeq) yield {
      val exact = (sh(a) & sh(b)).size.toDouble / (sh(a) | sh(b)).size
      math.abs(je - exact)
    }
    // k=64 on a few-hundred-shingle universe: stderr ~ 1/sqrt(64);
    // assert mean tracking, not per-pair luck
    assert(errs.sum / errs.size <= 0.15,
      s"mean |est-exact| = ${errs.sum / errs.size}")
    assert(errs.max <= 0.4, s"worst |est-exact| = ${errs.max}")
  }

  test("KMV ledger merge ≡ full recompute; overlap collapses; one-sided groups survive") {
    val s = spark
    import s.implicits._
    // group g1 splits across history/batch WITH an overlapping member
    // (v3 on both sides — must not double-count); g2 is history-only;
    // g3 is batch-only
    val history = Seq(
      ("g1", "v1"), ("g1", "v2"), ("g1", "v3"),
      ("g2", "x1"), ("g2", "x2"))
      .toDF("g", "v")
    val batch = Seq(
      ("g1", "v3"), ("g1", "v4"), ("g1", "v5"),
      ("g3", "y1"))
      .toDF("g", "v")
    val k = 4
    def report(df: org.apache.spark.sql.DataFrame) =
      Sketch.kmvLedgerReport(df, "g", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val inc = report(Sketch.kmvLedgerMerge(
      Sketch.kmvLedger(history, "g", "v", k), batch, "g", "v", k))
    val full = report(Sketch.kmvLedger(
      history.unionByName(batch), "g", "v", k))
    assert(inc == full, s"merged ledger ≠ full recompute:\n $inc\n $full")
    // g1 has 5 distinct members but the sketch holds k=4; g2/g3 are
    // under-filled so the sketch IS the exact count
    val byG = inc.map(x => x._1 -> x._2).toMap
    assert(byG("g1") == 4L && byG("g2") == 2L && byG("g3") == 1L, inc)
  }
}
