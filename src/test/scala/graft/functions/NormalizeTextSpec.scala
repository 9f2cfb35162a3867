package graft.functions

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NormalizeTextSpec extends SparkSpec {

  // \u escapes only in fixtures — pasted invisibles are unreviewable
  private val Zwsp = "\u200B"
  private val Zwnj = "\u200C"
  private val Bom = "\uFEFF"
  private val Acute = "\u0301" // combining acute
  private val EAcute = "\u00E9" // composed é

  private def norm(s: String): String =
    NormalizeText.compute(UTF8String.fromString(s)).toString

  test("ascii fast path: clean input returned unchanged (same instance)") {
    val in = UTF8String.fromString("plain ascii text with tabs\tand\nnewlines")
    assert(NormalizeText.compute(in) eq in)
  }

  test("strips controls, zero-widths and BOM; keeps tab/newline/CR") {
    assert(norm("ab" + Zwsp + "c" + Bom + "de") == "abcde")
    assert(norm("keep\tthese\nthree\rchars") == "keep\tthese\nthree\rchars")
    assert(norm("\u0080\u009Fx") == "x") // C1 mojibake range
  }

  test("composes to NFC; a zero-width between base and mark is stripped first") {
    assert(norm("e" + Acute) == EAcute)
    // U+200C between 'e' and the combining acute blocks composition
    // unless the strip runs before the normalizer — the order the
    // scaladoc promises
    assert(norm("e" + Zwnj + Acute) == EAcute)
    // already-composed text is untouched (idempotence on NFC input)
    assert(norm(EAcute) == EAcute)
  }

  test("idempotent over the expression column on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val once = Curation.normalizeText(col("text"))
    val twice = Curation.normalizeText(Curation.normalizeText(col("text")))
    assert(docs.filter(once =!= twice).count() == 0)
    // the synthetic corpus is clean ascii: normalization is the
    // identity there, which also exercises the fast path end-to-end
    assert(docs.filter(once =!= col("text")).count() == 0)
  }

  test("null propagates; codegen path agrees with direct eval") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(EAcute + Zwsp + " x"), None)
      .toDF("t")
      .select(Curation.normalizeText(col("t")).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(0) == EAcute + " x")
    assert(rows(1).isNullAt(0))
  }
}
