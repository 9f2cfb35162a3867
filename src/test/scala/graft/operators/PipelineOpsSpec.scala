package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the pipeline reshapes: chunking invariants, in-row
  * repetition stats vs the exploded ground truth, PII scrubbing on
  * crafted cases, mixture-weight algebra, and the bounded-levenshtein
  * contract vs the clamped full distance. */
class PipelineOpsSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunking covers every token with the configured overlap") {
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunkByTokens(docsDf(Seq((1L, text))),
        "doc_id", "text", chunkTokens = 64, stride = 48)
      .orderBy("chunk_idx").collect()
    // starts at 0, 48, 96 for 150 tokens: sizes 64, 64, 54
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(64, 64, 54))
    val chunks = out.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    // overlap: the last 16 tokens of chunk c are the first 16 of c+1
    assert(chunks(0).takeRight(16) == chunks(1).take(16))
    assert(chunks(1).takeRight(16) == chunks(2).take(16))
    // coverage: union of chunk tokens at stride offsets == the document
    assert(chunks(0) ++ chunks(1).drop(16) ++ chunks(2).drop(16) ==
      (1 to 150).map(i => s"w$i").toSeq)
  }

  test("chunking: short and empty documents") {
    val out = Chunking.chunkByTokens(
        docsDf(Seq((1L, "only three words"), (2L, ""))),
        "doc_id", "text", chunkTokens = 64, stride = 48)
      .collect()
    // doc 2 normalizes to a single empty word -> one (degenerate) chunk,
    // matching the whitespace-split convention used across the engine
    assert(out.count(_.getLong(0) == 1L) == 1)
    val c1 = out.find(_.getLong(0) == 1L).get
    assert(c1.getAs[String]("chunk_text") == "only three words")
    assert(c1.getAs[Int]("n_chunk_tokens") == 3)
  }

  test("in-row repetition stats equal the exploded ground truth (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), Dedup.words(col("text")).as("__w"))
    val (n, d, _, _) = TextAnalysis.repetitionStats(col("__w"))
    val inRow = docs.select(col("doc_id"), n.as("n"), d.as("d"),
      TextAnalysis.maxWordMultiplicity(col("__w")).as("top"))
    val truth = docs
      .select(col("doc_id"), explode(col("__w")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("d"), max("c").as("top"))
    assert(inRow.exceptAll(truth).isEmpty && truth.exceptAll(inRow).isEmpty)
  }

  test("maxWordMultiplicity on crafted arrays") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "a", "b")),
      (2L, Seq("x")),
      (3L, Seq("b", "a", "b", "a", "b"))).toDF("id", "w")
    val got = df.select(col("id"),
        TextAnalysis.maxWordMultiplicity(col("w")).as("m"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L, 1L, 3L))
  }

  test("PII scrub redacts emails, urls, digit runs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "mail me at jane.doe+x@corp.example.com or call 555 1234567",
      "see https://example.com/a?b=1 and http://x.io",
      "no pii here").toDF("text")
    val out = df.select(
        TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRegex).as("e"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.UrlRegex).as("u"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.NumRunRegex).as("n"),
        TextAnalysis.piiScrub(col("text")).as("scrubbed"))
      .collect()
    assert(out(0).getAs[Int]("e") == 1 && out(0).getAs[Int]("n") == 2)
    assert(out(0).getAs[String]("scrubbed") ==
      "mail me at <EMAIL> or call <NUM> <NUM>")
    assert(out(1).getAs[Int]("u") == 2)
    assert(out(1).getAs[String]("scrubbed") == "see <URL> and <URL>")
    assert(out(2).getAs[String]("scrubbed") == "no pii here")
  }

  test("uniform mixture weights: actual_frac sums to 1, weight*actual = target") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Mixture.uniformMixtureWeights(docs, "source").collect()
    val target = 1.0 / rows.length
    assert(math.abs(rows.map(_.getAs[Double]("actual_frac")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("weight") *
        r.getAs[Double]("actual_frac") - target) < 1e-9)
    }
  }

  test("temperature factors: largest source anchors at 1.0, order follows size, T=2 math") {
    val s = spark
    import s.implicits._
    val docs = (Seq.fill(16)("big") ++ Seq.fill(4)("mid") ++ Seq("tiny"))
      .zipWithIndex.map { case (src, i) => (i.toLong, src) }
      .toDF("doc_id", "source")
    val f = Mixture.temperatureFactors(docs, "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(f("big") == ((16L, 1.0)))
    assert(f("mid") == ((4L, 0.5)))   // sqrt(4/16)
    assert(f("tiny") == ((1L, 0.25))) // sqrt(1/16)
    // the flattening property: factors compress the size ratio toward 1
    assert(f("tiny")._2 > 1.0 / 16.0 && f("tiny")._2 < 1.0)
  }

  test("mixture epochs: floor/ceil of weight only, expectation matches, explode total") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // skew: five sources keep a quarter of their docs -> weight > 1
    val skewed = docs.filter(
      !(col("source").isin("src0", "src1", "src2", "src3", "src4")
        && col("doc_id") % 4 =!= 0))
    val assigned = Mixture.epochsToMixture(skewed, "doc_id", "source")
    val weights = Mixture.uniformMixtureWeights(skewed, "source")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    val rows = assigned.collect()
    assert(rows.length == skewed.count())
    // every doc gets floor(w) or floor(w)+1 epochs of ITS source weight
    rows.foreach { r =>
      val w = weights(r.getString(1))
      val e = r.getAs[Long]("n_epochs")
      assert(e == math.floor(w).toLong || e == math.floor(w).toLong + 1,
        s"epochs $e outside {floor, ceil} of weight $w")
    }
    // per-source mean epochs tracks the weight (hash draw is uniform;
    // tolerance generous because per-source n is small at sf0.001)
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val mean = rs.map(_.getAs[Long]("n_epochs")).sum.toDouble / rs.length
      assert(math.abs(mean - weights(src)) < 0.35,
        s"$src mean epochs $mean vs weight ${weights(src)}")
    }
    // materialization: one row per (doc, epoch), total = sum of epochs
    val mat = Mixture.materializeEpochs(assigned, "doc_id")
    assert(mat.count() == rows.map(_.getAs[Long]("n_epochs")).sum)
    assert(mat.filter(col("epoch") < 1 || col("epoch") > col("n_epochs"))
      .count() == 0)
  }

  test("incremental datasheet ≡ batch datasheet (hist median), any split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fullRow = Datasheet.summary(docs, "source", "text").collect().head
    val full = Seq(fullRow).map(r => r.toSeq.dropRight(1))
    // the full-corpus histogram median — what a correct census merge
    // must reproduce regardless of the history/batch split
    val fullHistMed = Datasheet.histMedianLo(
        Datasheet.tokenHistogram(docs, "text"))
      .collect().head.getLong(0)
    // the hist median's bin CONTAINS the lower-median order statistic
    // (rank (n+1) div 2) — the one-bin-width error bound
    val toks = docs
      .select(TextAnalysis.tokenCount(col("text")).as("tok"))
      .collect().map(_.getLong(0)).sorted
    val lowerMedian = toks((toks.length + 1) / 2 - 1)
    assert(fullHistMed <= lowerMedian && lowerMedian < fullHistMed + 16L,
      s"hist median $fullHistMed vs lower median $lowerMedian")
    Seq(2L, 3L, 5L).foreach { mod =>
      val history = docs.filter(col("doc_id") % mod === 0)
      val batch = docs.filter(col("doc_id") % mod =!= 0)
      // ledger with deliberate DUPLICATE rows — must be harmless
      val ledger = history
        .select(Dedup.fingerprint(col("text")).as("fp"))
        .union(history.limit(5)
          .select(Dedup.fingerprint(col("text")).as("fp")))
      val inc = Datasheet.incremental(
          Datasheet.summary(history, "source", "text"),
          history.select(col("source")),
          Datasheet.tokenHistogram(history, "text"), ledger, batch,
          "source", "text", expectedItems = 1L << 16)
        .collect().head
      assert(inc.toSeq.dropRight(1) == full.head,
        s"mod=$mod incremental row diverged")
      assert(inc.getAs[Long]("p50_tokens_hist_lo") == fullHistMed,
        s"mod=$mod merged-census median diverged")
    }
  }

  test("histogram drift: exact share cross-multiplication, both directions") {
    val s = spark
    import s.implicits._
    def doc(tokens: Int): String = Seq.fill(tokens)("w").mkString(" ")
    // binWidth 8: bin0 = 4 tokens, bin1 = 12, bin2 = 20, bin5 = 40;
    // both slices total 12 docs so shares read directly off counts
    val a = (Seq.fill(6)(doc(4)) ++ Seq.fill(4)(doc(12)) ++
      Seq.fill(2)(doc(20))).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val b = (Seq.fill(2)(doc(4)) ++ Seq.fill(4)(doc(12)) ++
      Seq.fill(5)(doc(20)) ++ Seq(doc(40))).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Datasheet.histogramDrift(a, b, "text",
        binWidth = 8L, numBins = 256, ratioNum = 3L, ratioDen = 2L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(out == Seq(
      (0L, 6L, 2L, true),   // 6/12 vs 2/12: 3x > 1.5x
      (1L, 4L, 4L, false),  // equal shares
      (2L, 2L, 5L, true),   // 2.5x the other direction
      (5L, 0L, 1L, true)))  // occupied vs empty always drifts
    // exactly at the ratio boundary: 3/12 vs 2/12 is 1.5x — NOT drift
    // (strict inequality; the band is inclusive)
    val a2 = (Seq.fill(3)(doc(4)) ++ Seq.fill(9)(doc(12))).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val b2 = (Seq.fill(2)(doc(4)) ++ Seq.fill(10)(doc(12))).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val boundary = Datasheet.histogramDrift(a2, b2, "text",
        binWidth = 8L, numBins = 256, ratioNum = 3L, ratioDen = 2L)
      .orderBy("bin").collect().map(_.getBoolean(3)).toSeq
    assert(boundary == Seq(false, false))
  }

  test("incremental dedup flags history dups and intra-batch copies") {
    val s = spark
    import s.implicits._
    val newDocs = Seq(
      (10L, "alpha beta"), (11L, "fresh text"), (12L, "alpha beta"))
      .toDF("doc_id", "text")
    val known = Seq(Tuple1("alpha beta"), Tuple1("old text")).toDF("t")
      .select(Dedup.fingerprint(col("t")).as("fp"))
    val out = Dedup.incrementalExact(newDocs, known, "doc_id", "text", "fp")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0),
      r.getAs[Boolean]("dup_of_history"), r.getAs[Boolean]("intra_keep")))
      .toSeq == Seq((10L, true, true), (11L, false, true), (12L, true, false)))
  }

  test("bloom incremental dedup: bit-identical to the plain path, bloom in the plan") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.filter(col("doc_id") % 3 === 0)
    // guarantee at least one cross-history dup: re-submit a history text
    val histText = history.orderBy("doc_id").select("text").as[String].head()
    val newBatch = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((999999L, histText)).toDF("doc_id", "text"))
    val knownFps = history.select(Dedup.fingerprint(col("text")).as("fp"))
    val bloom = Dedup.incrementalExactBloom(
      newBatch, knownFps, "doc_id", "text", "fp",
      expectedItems = 1024, fpp = 0.03)
    val plain = Dedup.incrementalExact(newBatch, knownFps, "doc_id", "text", "fp")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getAs[Boolean]("dup_of_history"), r.getAs[Boolean]("intra_keep")))
        .toSeq
    val b = rows(bloom)
    assert(b == rows(plain), "bloom pre-filter + exact verify must lose nothing")
    assert(b.exists(_._3) && b.exists(!_._3),
      "fixture must exercise both history-dup and fresh rows")
    // the membership check must be the bloom subquery, not a bare join
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom in plan:\n$plan")
    assert(plan.contains("Subquery"), "bloom must attach as a scalar subquery")
  }

  test("bloom pre-filter rejects a disjoint batch without consulting history") {
    val s = spark
    import s.implicits._
    // disjoint corpora: every new fp must come back non-dup even though
    // nothing is verified (the bloom can only err toward candidates,
    // never toward false negatives)
    val newDocs = (1L to 50L).map(i => (i, s"fresh document number $i"))
      .toDF("doc_id", "text")
    val known = (1L to 50L).map(i => Tuple1(s"ancient scroll $i")).toDF("t")
      .select(Dedup.fingerprint(col("t")).as("fp"))
    val out = Dedup.incrementalExactBloom(
      newDocs, known, "doc_id", "text", "fp", expectedItems = 64, fpp = 0.03)
    assert(out.filter(col("dup_of_history")).count() == 0)
    assert(out.count() == 50)
  }

  test("dupClusters finds components: chain, clique edge, singleton pair") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 (needs >1 propagation round), pair 7-9
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (9L, 7L, 2L)))
  }

  test("dupClusters converges on a long chain (diameter > 2)") {
    val s = spark
    import s.implicits._
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(pairs).collect()
    assert(out.length == 9 && out.forall(_.getLong(1) == 1L) &&
      out.forall(_.getLong(2) == 9L))
  }

  test("bounded levenshtein == clamped full distance on LSH candidates (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
    val norm = docs.select(col("doc_id"), Dedup.normalize(col("text")).as("nt"))
    val joined = pairs
      .join(norm.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nt", "na"), "doc_a")
      .join(norm.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nt", "nb"), "doc_b")
    val bad = joined.select(
        levenshtein(col("na"), col("nb"), 40).as("bounded"),
        when(levenshtein(col("na"), col("nb")) <= 40,
          levenshtein(col("na"), col("nb"))).otherwise(-1).as("clamped"))
      .filter(col("bounded") =!= col("clamped"))
    assert(bad.isEmpty)
  }
}
