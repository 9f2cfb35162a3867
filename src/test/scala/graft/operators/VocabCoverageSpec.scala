package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabCoverageSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("vocabTopN: deterministic cut with token-ascending tie-break") {
    val s = spark
    import s.implicits._
    // counts: b=3, a=2, c=2 — at n=2 the tie between a and c must
    // resolve to a (token asc), never by partition luck
    val tiny = Seq((1L, "b a c"), (2L, "b a c"), (3L, "b")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabTopN(tiny, "text", n = 2)
      .collect().map(_.getString(0)).toSet
    assert(vocab == Set("b", "a"))
  }

  test("oovStats: hand corpus counts, empty doc, coverage flag") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, "b a c"),   // with vocab {b,a}: 3 tokens, 1 oov (33% > 10%)
      (2L, "b b b"),   // 3 tokens, 0 oov
      (3L, "   "),     // empty after trim: (0, 0, covered)
      (4L, "z z")      // fully oov
    ).toDF("doc_id", "text")
    val vocab = Seq("b", "a").toDF("token")
    val out = TextAnalysis.oovStats(tiny, "doc_id", "text", vocab,
        oovPctMax = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    assert(out(1L).getAs[Long]("n_tokens") == 3L)
    assert(out(1L).getAs[Long]("n_oov") == 1L)
    assert(!out(1L).getAs[Boolean]("well_covered"))
    assert(out(2L).getAs[Long]("n_oov") == 0L)
    assert(out(2L).getAs[Boolean]("well_covered"))
    assert(out(3L).getAs[Long]("n_tokens") == 0L)
    assert(out(3L).getAs[Boolean]("well_covered"))
    assert(out(4L).getAs[Long]("n_oov") == 2L)
    assert(!out(4L).getAs[Boolean]("well_covered"))
  }

  test("oovStats: totality and token-count agreement on real documents") {
    val vocab = TextAnalysis.vocabTopN(docs, "text", n = 100)
    val out = TextAnalysis.oovStats(docs, "doc_id", "text", vocab)
    assert(out.count() == docs.count())
    // the exploded-and-refiltered token count must agree with the
    // per-row tokenCount expression (same normalization, no explode)
    val bad = out
      .join(docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("expect_n")), "doc_id")
      .filter(col("n_tokens") =!= col("expect_n") ||
        col("n_oov") > col("n_tokens") || col("n_oov") < 0)
    assert(bad.count() == 0)
  }

  test("oovStats: a vocab covering the whole corpus yields zero oov") {
    val everything = TextAnalysis.vocabTopN(docs, "text", n = 1000000)
    val out = TextAnalysis.oovStats(docs, "doc_id", "text", everything)
    assert(out.filter(col("n_oov") =!= 0L).count() == 0)
    assert(out.filter(!col("well_covered")).count() == 0)
  }

  test("oovStats: vocab probe is a broadcast join, not a shuffle") {
    val vocab = TextAnalysis.vocabTopN(docs, "text", n = 100)
    val plan = TextAnalysis.oovStats(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("incremental frequency spectrum ≡ full recompute") {
    val s = spark
    import s.implicits._
    // "shared" occurs in both slices (counts must add, not union);
    // "fresh" exists only in the batch (appends); "old" only history
    val history = Seq((1L, "old shared shared"), (2L, "old shared"))
      .toDF("doc_id", "text")
    val batch = Seq((3L, "fresh shared fresh"), (4L, "shared"))
      .toDF("doc_id", "text")
    def spec(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = spec(TextAnalysis.incrementalFrequencySpectrum(
      TextAnalysis.wordCensus(history, "text"), batch, "text"))
    val full = spec(TextAnalysis.frequencySpectrum(
      TextAnalysis.wordCensus(history.unionByName(batch), "text")))
    assert(inc == full, s"incremental ≠ full:\n inc=$inc\n full=$full")
    // hand-check: old=2, fresh=2, shared=5 → spectrum {2→2, 5→1}
    assert(full == Set((2L, 2L), (5L, 1L)), full.toString)
  }

  test("dedupSentences: first occurrence kept in order, empties dropped") {
    val s = spark
    import s.implicits._
    val docs2 = Seq(
      (1L, "Buy now. Read the article. Buy now. The end."),
      (2L, "No repeats here. Truly none."),
      (3L, "..."),                       // only empty fragments
      (4L, "  Spaced.  Spaced. spaced.") // trim folds, case does not
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSentences(docs2, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == (4L, 1L, "Buy now. Read the article. The end"),
      out.toString)
    assert(out(2L) == (2L, 0L, "No repeats here. Truly none"))
    // all-empty split → doc emits nothing
    assert(!out.contains(3L))
    // trim collapses the duplicate; distinct CASE variants both stay
    assert(out(4L) == (3L, 1L, "Spaced. spaced"), out.toString)
  }

  test("maskTokens: deterministic, per-doc keys, counts match the text") {
    val s = spark
    import s.implicits._
    val sentence = ("tok " * 200).trim
    val docs = Seq((1L, sentence), (2L, sentence), (3L, ""))
      .toDF("doc_id", "text")
    def run() = TextAnalysis.maskTokens(docs, "doc_id", "text", pct = 15)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val a = run()
    // deterministic: a rerun reproduces the identical corruption
    assert(a == run(), "masking must be reproducible run-to-run")
    // the mask key includes the doc id: identical sentences in
    // different docs corrupt differently
    assert(a(1L)._3 != a(2L)._3, "cross-doc mask correlation")
    // counts are consistent with the emitted text, and the rate is in
    // the statistical neighborhood of pct (200 draws at 15%)
    for ((_, (n, m, txt)) <- a if n > 1) {
      assert(txt.split(" ").length.toLong == n)
      assert(txt.split(" ").count(_ == "[MASK]").toLong == m)
      assert(m > 10 && m < 60, s"mask rate implausible: $m/200")
    }
    // whitespace-only/empty text counts 0 tokens (the tokenCount
    // convention) and can never emit '[MASK]' as its whole text
    assert(a(3L) == ((0L, 0L, "")))
  }
}
