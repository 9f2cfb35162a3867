package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("collocations: hand-checked lift on a tiny corpus") {
    val s = spark
    import s.implicits._
    // bigrams: doc1 (a,b),(b,x),(x,a),(a,b); doc2 (a,b),(b,x),(x,b),(b,b)
    // => N = 8, c_ab(a,b) = 3; unigrams c(a) = 3, c(b) = 5
    val tiny = Seq((1L, "a b x a b"), (2L, "a b x b b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(tiny, "doc_id", "text",
      minCount = 2L, topN = 10).collect()
    val ab = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getAs[Long]("c_ab") == 3L)
    assert(math.abs(ab.getAs[Double]("lift") - 8.0 * 3 / (3 * 5)) < 1e-12)
  }

  test("collocations: rank is 1..topN and lift non-increasing") {
    val out = TextAnalysis.collocations(docs, "doc_id", "text", 5L, 20)
      .orderBy("rnk").collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Int]("rnk")).toSeq == (1 to 20))
    val lifts = out.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("collocations: single-word and empty docs produce no bigrams, no error") {
    val s = spark
    import s.implicits._
    val degenerate = Seq((1L, "solo"), (2L, "a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(degenerate, "doc_id", "text", 1L, 10)
      .collect()
    // only doc 2 contributes; "a b" twice, "b a" once
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("b", "a")))
  }

  test("collocations: no corpus-wide window — top-N is TakeOrderedAndProject") {
    val plan = TextAnalysis.collocations(docs, "doc_id", "text", 5L, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
