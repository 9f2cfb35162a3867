package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 curation operators: decontamination, boilerplate scrub,
  * int8 quantization, semantic dedup. Synthetic frames pin the
  * semantics; the sf0.001 testdata pins recall against the exact
  * float baseline. */
class CurationOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------------------------------------------ Decontam

  test("contamination flags exactly the docs sharing a benchmark 3-gram") {
    val bench = docs(100L -> "alpha beta gamma delta")
    val corpus = docs(
      1L -> "x y alpha beta gamma z", // shares "alpha beta gamma"
      2L -> "alpha beta epsilon zeta", // bigram overlap only — clean
      3L -> "totally unrelated words here")
    val r = Decontam.contaminationReport(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq ===
      Seq((1L, 1L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("contamination counts DISTINCT matched shingles, not occurrences") {
    val bench = docs(100L -> "a b c d")
    // "a b c" appears twice in the doc — still one distinct shingle hit;
    // "b c d" also present → 2 distinct hits
    val corpus = docs(1L -> "a b c a b c d")
    val r = Decontam.contaminationReport(corpus, bench, "doc_id", "text", 3)
      .collect()
    assert(r.head.getLong(1) === 2L)
  }

  test("winnowed decontam: quoting doc flagged with its bench source, clean doc not") {
    val s = spark
    import s.implicits._
    val quote = "the bench answer is alpha beta gamma delta epsilon zeta"
    val bench = Seq((100L, quote), (101L, "other bench item words here now"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"intro words then $quote and a closing remark too"),
      (2L, "completely original prose with no quoted benchmark content"))
      .toDF("doc_id", "text")
    val out = Decontam.winnowedContamination(corpus, bench,
        "doc_id", "text", k = 3, windowW = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 embeds a 10-word bench run (≥ w+k-1 = 6 → the winnowing
    // guarantee forces a shared fingerprint); doc 2 is clean
    assert(out.contains((1L, 100L)), s"quoting doc must flag: $out")
    assert(!out.exists(_._1 == 2L), s"clean doc flagged: $out")
  }

  test("winnowed decontam spans: regions sit inside the true quote, aligned") {
    val s = spark
    import s.implicits._
    // a 30-word quote with all-distinct words, embedded after a
    // 5-word preamble — every matched fingerprint must fall inside it
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"w1 w2 w3 w4 w5 $quote t1 t2 t3 t4"),
      (2L, "fully original words without any benchmark quotation at all"))
      .toDF("doc_id", "text")
    val out = Decontam.winnowedContaminationSpans(corpus, bench,
        "doc_id", "text", k = 3, windowW = 4, minShared = 2,
        maxGap = 7, minSpan = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out.nonEmpty && out.forall(x => x._1 == 1L && x._2 == 100L),
      s"expected regions only for the quoting pair: $out")
    out.foreach { case (_, _, startDoc, startBench, span) =>
      // certified extent lies INSIDE the quote (words 6..35 in doc 1,
      // 1..30 in bench), on the single true diagonal
      assert(startDoc >= 6L && startDoc + span - 1 <= 35L, out.toString)
      assert(startBench == startDoc - 5L, "diagonal misaligned: " + out)
    }
    // a 30-word interior means many matches ≤ windowW apart: with
    // maxGap = windowW + k they stitch into ONE region covering the
    // quote's interior (≥ 30 − 2·(w+k−2) = 20 certified words)
    assert(out.size == 1, s"quote fragmented: $out")
    assert(out.head._5 >= 20L, s"certified region too short: $out")
  }

  test("winnowed decontam spans: pair gate inherits q175 semantics") {
    val s = spark
    import s.implicits._
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val corpus = Seq((1L, s"w1 w2 w3 w4 w5 $quote t1 t2 t3"))
      .toDF("doc_id", "text")
    val loose = Decontam.winnowedContaminationSpans(corpus, bench,
      "doc_id", "text", k = 3, windowW = 4, minShared = 2,
      maxGap = 7, minSpan = 3).count()
    // an unreachable minShared suppresses regions for the pair even
    // though individual fingerprints still match
    val strict = Decontam.winnowedContaminationSpans(corpus, bench,
      "doc_id", "text", k = 3, windowW = 4, minShared = 1000,
      maxGap = 7, minSpan = 3).count()
    assert(loose > 0L && strict == 0L, s"pair gate broken: $loose/$strict")
  }

  test("redactContamination cuts the quoted region, leaves clean docs, totality") {
    val s = spark
    import s.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val bench = Seq((100L, s"bench intro $quote bench outro"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"a1 a2 $quote a3 a4"),     // quotes the benchmark → cut
      (2L, "clean words only here"),   // untouched, still emitted
      (3L, ""))                        // empty doc, still emitted
      .toDF("doc_id", "text")
    val out = Decontam.redactContamination(corpus, bench, "doc_id",
        "text", k = 3, windowW = 4, minShared = 2, maxGap = 7,
        minSpan = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out.size == 3, "every corpus doc must be emitted")
    assert(out(2L) == ("clean words only here", 0L))
    assert(out(3L)._2 == 0L)
    val (kept1, removed1) = out(1L)
    // the certified extent of the 12-word quote is cut; the doc's own
    // frame words survive (edge slack can nibble at a3 but never the
    // leading frame, and here the quote is interior so both survive)
    assert(removed1 >= 10L && removed1 <= 14L, s"cut $removed1 words")
    assert(kept1.startsWith("a1 a2"), s"leading frame lost: $kept1")
    assert(!kept1.contains("q5 q6"), s"quote core survived: $kept1")
  }

  test("ngramNovelty: fully-known 0, unseen 1e6, mixed exact, repeats once") {
    val s = spark
    import s.implicits._
    val history = Dedup.explodedShingles(
      Seq((100L, "a b c d e")).toDF("doc_id", "text"),
      "doc_id", "text", 3).select(col("sh"))
    val batch = Seq(
      (1L, "a b c d e"),        // every shingle known → novelty 0
      (2L, "x y z w"),          // nothing known → novelty 1e6
      (3L, "a b c x y z"),      // 1 known of 4 distinct → 750000
      (4L, "a b c a b c d"),    // repeats collapse: shingles {abc,bca,cab,abc→,bcd}
      (5L, "p q"))              // too short for a 3-shingle → (0,0,0) row
      .toDF("doc_id", "text")
    val out = Decontam.ngramNovelty(history, batch, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (3L, 0L, 0L))
    assert(out(2L) == (2L, 2L, 1000000L))
    assert(out(3L) == (4L, 3L, 750000L))
    // doc 4 distinct shingles: "a b c"(known), "b c a", "c a b",
    // "b c d"(known? history has "b c d" ✓) → 4 distinct, 2 novel
    assert(out(4L) == (4L, 2L, 500000L), out.toString)
    // roster contract: a short doc reports zeros instead of vanishing
    assert(out(5L) == (0L, 0L, 0L), out.toString)
    assert(out.size == 5, "every batch doc must appear exactly once")
  }

  test("ngramLedgerMerge ≡ distinct union; no duplicate shingles appended") {
    val s = spark
    import s.implicits._
    val history = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val ledger0 = Dedup.explodedShingles(history, "doc_id", "text", 3)
      .select(col("sh")).distinct()
    val batch = Seq(
      (1L, "a b c d"),       // "a b c","b c d" already known
      (2L, "x y z a b c"))   // adds "x y z","y z a","z a b"
      .toDF("doc_id", "text")
    val merged = Decontam.ngramLedgerMerge(ledger0, batch,
        "doc_id", "text", 3)
      .collect().map(_.getString(0)).toSeq
    assert(merged.length == merged.distinct.length,
      "merge appended a shingle the ledger already held")
    val expect = Dedup.explodedShingles(
        history.unionByName(batch), "doc_id", "text", 3)
      .select(col("sh")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(merged.toSet == expect, "merged ledger ≠ distinct union")
  }

  test("sourceUniqueness: exclusive vs shared shingles, repeats collapse") {
    val s = spark
    import s.implicits._
    // source A: 2 distinct shingles, one shared with B (the repeat of
    // "a b c" inside A must not inflate its count); B adds one
    // exclusive shingle; C is entirely exclusive
    val corpus = Seq(
      (1L, "a b c a b c d", "A"),  // shingles: {a b c (×2→1), b c a, c a b, a b c... , b c d}
      (2L, "a b c x", "B"),
      (3L, "p q r s", "C"))
      .toDF("doc_id", "text", "source")
    val out = Decontam.sourceUniqueness(corpus, "source", "text", k = 3)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // A's distinct shingles: "a b c","b c a","c a b","b c d" (repeat
    // collapsed); "a b c" is shared with B → 3 exclusive of 4
    assert(out("A") == (4L, 3L), out.toString)
    // B: {"a b c" shared, "b c x" exclusive}
    assert(out("B") == (2L, 1L), out.toString)
    // C: both shingles exclusive
    assert(out("C") == (2L, 2L), out.toString)
  }

  test("semantic contamination: nearest eval item, tie to smaller id, threshold flag") {
    val s = spark
    import s.implicits._
    def emb(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")
    val eval = emb(
      100L -> Array(1f, 0f, 0f),
      101L -> Array(0f, 1f, 0f),
      102L -> Array(0f, 1f, 0f)) // duplicate direction: tie trap
    val corpus = emb(
      1L -> Array(2f, 0f, 0f),     // cos 1.0 with eval 100 → flagged
      2L -> Array(1f, 1f, 0f),     // cos ~0.707 with 100 AND 101/102 tie
      3L -> Array(0f, 0f, 5f))     // orthogonal to all → cos 0, clean
    val r = Decontam.semanticContamination(corpus, eval,
        "vec_id", "embedding", tau = 0.9)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(3)))
    assert(r.toSeq == Seq((1L, 100L, true), (2L, 100L, false),
      (3L, 100L, false)))
    // doc 2's cos ties across 100/101/102 at ~0.707 — the argmax must
    // break to the SMALLEST eval id deterministically
    val cos2 = Decontam.semanticContamination(corpus, eval,
        "vec_id", "embedding", tau = 0.5)
      .filter(col("doc_id") === 2L).collect().head
    assert(cos2.getLong(1) == 100L && cos2.getBoolean(3))
  }

  test("LSH semantic contamination: flagged ⊆ exact-flagged, recall ≥ 0.6, full coverage") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = e.filter(col("vec_id") % 19 =!= 0)
    val eval = e.filter(col("vec_id") % 19 === 0)
    val tau = 0.3
    def flagged(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exact = Decontam.semanticContamination(corpus, eval,
      "vec_id", "embedding", tau)
    val lsh = Decontam.semanticContaminationLsh(corpus, eval,
      "vec_id", "embedding", tau)
    val ef = flagged(exact); val lf = flagged(lsh)
    assert(lf.subsetOf(ef), "LSH flag precision must be 1.0 — a " +
      "candidate's exact cosine ≥ τ implies the true max is too")
    assert(ef.nonEmpty, "fixture must flag something or the test is vacuous")
    val recall = (ef & lf).size.toDouble / ef.size
    assert(recall >= 0.6, s"LSH contamination recall $recall (${lf.size}/${ef.size})")
    // the report still covers every corpus doc (misses surface unflagged)
    assert(lsh.count() == corpus.count())
  }

  // ------------------------------------------------------------ Curation

  test("boilerplate scrub removes high-DF words, keeps rare ones, preserves order") {
    // "common" in 3/3 docs (df 100%), every other word rarer
    val d = docs(
      1L -> "common rare1 common",
      2L -> "common rare2",
      3L -> "rare3 common")
    val r = Curation.scrubBoilerplate(d, "doc_id", "text", thrNum = 9, thrDen = 10)
      .orderBy("doc_id").collect()
    assert(r.map(_.getString(3)).toSeq === Seq("rare1", "rare2", "rare3"))
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ===
      Seq((3L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("scrub with no boilerplate words is the identity on words") {
    val d = docs(1L -> "a b", 2L -> "c d")
    val r = Curation.scrubBoilerplate(d, "doc_id", "text", 9, 10)
      .orderBy("doc_id").collect()
    assert(r.map(_.getString(3)).toSeq === Seq("a b", "c d"))
  }

  // ------------------------------------------------------------ Quantize

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("int8 codes are bounded by ±127 and preserve the max component") {
    val codes = emb.select(Quantize.int8Codes(col("embedding")).as("c"))
      .select(explode(col("c")).as("v"))
      .agg(min("v"), max("v")).collect().head
    assert(codes.getLong(0) >= -127L && codes.getLong(1) <= 127L)
    // at least one component per vector hits ±127 (the scale definition)
    val hit = emb.select(Quantize.int8Codes(col("embedding")).as("c"))
      .select(array_max(expr("transform(c, x -> abs(x))")).as("m"))
      .filter(col("m") =!= 127L).count()
    assert(hit === 0L)
  }

  test("groupAffinity: exact centroid sums, orthogonal = 0, colinear = 1") {
    val s = spark
    import s.implicits._
    // a and c point the same way (cos 1 — integer dots make it EXACT:
    // sqrt of a perfect square is exact), b is orthogonal to both
    val vecs = Seq(
      ("a", Seq(1.0, 0.0, 0.0, 0.0)), ("a", Seq(1.0, 0.0, 0.0, 0.0)),
      ("b", Seq(0.0, 2.0, 0.0, 0.0)),
      ("c", Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("label", "embedding")
    val out = Quantize.groupAffinity(vecs, "label", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out.size == 3, s"C(3,2) pairs expected: $out") // a-b a-c b-c
    val (nA, _, dotAb, cosAb) = out(("a", "b"))
    assert(nA == 2L && dotAb == 0L && cosAb == 0.0, out.toString)
    val (_, nC, dotAc, cosAc) = out(("a", "c"))
    // csum_a = (254,0,0,0), csum_c = (127,0,0,0): dot exact, cos exact 1
    assert(nC == 1L && dotAc == 254L * 127L && cosAc == 1.0, out.toString)
    assert(out(("b", "c"))._4 == 0.0)
  }

  test("incremental group affinity ≡ full recompute; one-sided groups survive") {
    val s = spark
    import s.implicits._
    // a splits across history/batch (sums must merge element-wise);
    // b is history-only; c is batch-only (a brand-new group)
    val history = Seq(
      (1L, "a", Seq(1.0, 0.0, 2.0, 0.0)),
      (2L, "a", Seq(0.5, 1.0, 0.0, 0.0)),
      (3L, "b", Seq(0.0, 2.0, 0.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val batch = Seq(
      (4L, "a", Seq(2.0, 0.0, 1.0, 0.0)),
      (5L, "c", Seq(0.0, 0.0, 3.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val inc = rows(Quantize.incrementalGroupAffinity(
      Quantize.affinityLedger(history.select(col("label"), col("embedding")),
        "label", "embedding"),
      batch.select(col("label"), col("embedding")), "label", "embedding"))
    val full = rows(Quantize.groupAffinity(
      history.unionByName(batch).select(col("label"), col("embedding")),
      "label", "embedding"))
    assert(inc == full, s"incremental ≠ full:\n inc=$inc\n full=$full")
    assert(inc.map(t => (t._1, t._2)) ==
      Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("quantized top-5 recall vs exact float top-5 is ≥ 0.8") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Quantize.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall")
  }

  test("sign bits pack to 32-bit halves; hamming(a,a) = 0; rescore recall ≥ 0.8") {
    val bits = Quantize.withSignBits(emb, "vec_id", "embedding")
    val bounds = bits.agg(min("b0"), max("b0"), min("b1"), max("b1")).collect().head
    (0 until 4).foreach { i =>
      assert(bounds.getLong(i) >= 0L && bounds.getLong(i) < (1L << 32))
    }
    val selfHam = bits.select(
      Quantize.hamming(col("b0"), col("b1"), col("b0"), col("b1")).as("h"))
      .filter(col("h") =!= 0).count()
    assert(selfHam === 0L)

    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rescored = Quantize.hammingRescoreTopK(emb, q, "vec_id", "embedding", 5, 100)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect rescored).size.toDouble / exact.size
    assert(recall >= 0.8, s"binary-rescore recall $recall")
  }

  // ------------------------------------------------------------ SpanDedup

  test("duplicated spans: a shared 10-word run yields one maximal span in each doc") {
    // shared run of 10 words → 3 overlapping 8-grams → ONE span of 10
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $shared b1 b2",     // span at word offset 3
      2L -> s"$shared c1 c2 c3 c4 c5",     // span at word offset 0
      3L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9")  // unique 8-grams — no span
    val r = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq((1L, 3L, 10L, 3L), (2L, 0L, 10L, 3L)))
  }

  test("duplicated spans: disjoint repeats stay separate islands") {
    val g1 = (1 to 8).map(i => s"p$i").mkString(" ")
    val g2 = (1 to 8).map(i => s"q$i").mkString(" ")
    val d = docs(
      1L -> s"$g1 x1 x2 x3 $g2",
      2L -> s"$g2 y1 y2 y3 $g1")
    val r = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, 0L, 8L), (1L, 11L, 8L),
      (2L, 0L, 8L), (2L, 11L, 8L)))
  }

  // ------------------------------------------------------------ Profile

  test("column profile counts nulls, distincts, and min/max in one pass") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "v")
    val p = Profile.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("k") === ((4L, 1L, 2L, "1", "2")))
    assert(p("v") === ((4L, 1L, 2L, "a", "b")))
  }

  test("approx profile tracks the exact census within HLL tolerance") {
    // the 100 TB mode: approx_count_distinct (rsd ≈ 2.3% at the default
    // precision) replaces the COUNT(DISTINCT) expand; everything else —
    // nulls, rows, min/max — must stay byte-identical to the exact form
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    def asMap(exact: Boolean) = Profile.profile(docs, cols, exact = exact)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))))
      .toMap
    val e = asMap(exact = true)
    val a = asMap(exact = false)
    cols.foreach { c =>
      val (en, enn, end, emn, emx) = e(c)
      val (an, ann, and, amn, amx) = a(c)
      assert((en, enn, emn, emx) === ((an, ann, amn, amx)),
        s"$c: non-distinct columns must not change in approx mode")
      assert(math.abs(and - end) <= math.max(1L, (end * 0.2).toLong),
        s"$c: approx distinct $and vs exact $end outside 20% envelope")
    }
  }

  // ------------------------------------------------------------ SemDedup

  test("semantic dedup: one rep per cluster, reps never dropped, drops respect tau") {
    val v = SemDedup.verdicts(emb, "vec_id", "embedding",
      numCentroids = 8, iterations = 2, tau = 0.4).collect()
    assert(v.length === emb.count())
    val byCluster = v.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(_.getBoolean(2)) === 1, s"cluster $cid rep count")
    }
    v.foreach { r =>
      val (isRep, cos, dropped) =
        (r.getBoolean(2), r.getDouble(3), r.getBoolean(4))
      if (isRep) assert(!dropped)
      if (dropped) assert(cos >= 0.4)
      if (!isRep && cos >= 0.4) assert(dropped)
    }
  }

  // ------------------------------------------ Decontam.sourceOverlapMatrix

  test("source overlap matrix: shared shingles counted once per pair, no self/empty pairs") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "a", "alpha beta gamma delta"),   // shingles: abg, bgd
      (2L, "a", "alpha beta gamma again"),   // abg repeated in src a
      (3L, "b", "alpha beta gamma other"),   // abg -> shared with a
      (4L, "b", "beta gamma delta extra"),   // bgd -> shared with a
      (5L, "c", "totally different words entirely") // overlaps nobody
    ).toDF("doc_id", "source", "text")
    val m = Decontam.sourceOverlapMatrix(corpus, "source", "text", k = 3)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // a∩b = {abg, bgd} counted ONCE each despite src-a repetition;
    // c appears in no pair; no (x, x) rows; src_a < src_b ordering
    assert(m.toSeq == Seq(("a", "b", 2L)))
  }

  test("source overlap matrix: plan has no shingle self-join (single exchange to the source-set fold)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Decontam.sourceOverlapMatrix(docs, "source", "text", 3)
      .queryExecution.executedPlan.toString
    // the quadratic shape would appear as a SortMergeJoin/ShuffledHashJoin
    // of the shingle frame against itself
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("ShuffledHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
