package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BigramLmSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("bigram LM: exact entropy on a hand corpus") {
    val s = spark
    import s.implicits._
    // corpus bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a b c"
    // -> (a,b),(b,c). Counts: c(a,b)=3, c(b,a)=1, c(b,c)=1; LHS totals
    // c(a,.)=3, c(b,.)=2. So P(b|a)=1 (0 bits), P(a|b)=P(c|b)=1/2 (1 bit).
    val tiny = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(tiny, "doc_id", "text", rareMax = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(out(1L).getAs[Long]("n_distinct_bigrams") == 2L)
    assert(out(1L).getAs[Long]("n_rare") == 1L) // (b,a) has corpus count 1
    assert(math.abs(out(1L).getAs[Double]("entropy") - 1.0 / 3.0) < 1e-12)
    assert(out(2L).getAs[Long]("n_bigrams") == 2L)
    assert(math.abs(out(2L).getAs[Double]("entropy") - 0.5) < 1e-12)
    // a one-word document keeps its row with zero bigrams
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
    assert(out(3L).getAs[Double]("entropy") == 0.0)
    assert(out.values.forall(_.getAs[Boolean]("entropy_ok")))
  }

  test("bigram LM: totality and integer-consistency on real documents") {
    val out = TextAnalysis.bigramLm(docs, "doc_id", "text", rareMax = 2L)
    assert(out.count() == docs.count())
    // n_bigrams == word count - 1 for every multi-word doc; entropy in
    // range; distinct <= total; rare <= total
    val bad = out
      .join(docs.select(col("doc_id"),
        (size(Dedup.words(col("text"))) - 1).cast("long").as("expect_n")),
        "doc_id")
      .filter(col("n_bigrams") =!= greatest(col("expect_n"), lit(0L)) ||
        col("n_distinct_bigrams") > col("n_bigrams") ||
        col("n_rare") > col("n_bigrams") ||
        !col("entropy_ok"))
    assert(bad.count() == 0)
  }

  test("bigram LM: common continuations score lower than rare ones") {
    val s = spark
    import s.implicits._
    // corpus: a->b twice, a->{c,d,e} once each. Doc 1 uses the common
    // continuation (P(b|a)=2/5), doc 2 only rare ones (P=1/5 each) —
    // its average surprisal must be strictly higher.
    val tiny = Seq(
      (1L, "a b a b"),
      (2L, "a c a d a e")).toDF("doc_id", "text")
    val byId = TextAnalysis.bigramLm(tiny, "doc_id", "text", 2L)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("entropy")).toMap
    assert(byId(1L) < byId(2L))
    val h1 = (2 * math.log(5.0 / 2.0) / math.log(2)) / 3
    assert(math.abs(byId(1L) - h1) < 1e-12)
  }
}
