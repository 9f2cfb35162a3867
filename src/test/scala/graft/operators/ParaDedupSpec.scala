package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ParaDedupSpec extends SparkSpec {

  test("paragraph dedup: keep-first, partial scrub, full-dup doc vanishes") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha one\nbeta two\ngamma three"),
      (2L, "beta two\ndelta four"),      // beta is doc1's -> keeps delta only
      (3L, "alpha one\nbeta two\ngamma three"), // full dup -> vanishes
      (4L, " \nepsilon five"))           // blank line dropped, not deduped
      .toDF("doc_id", "text")
    val paras = ParaDedup.paragraphs(docs, "doc_id", "text", "\n")
    val out = ParaDedup.reassemble(ParaDedup.dedupKeepFirst(paras), "\n")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(
      (1L, "alpha one\nbeta two\ngamma three", 3L),
      (2L, "delta four", 1L),
      (4L, "epsilon five", 1L)))
  }

  test("keep-first elects the smallest (doc_id, pos) occurrence corpus-wide") {
    val s = spark
    import s.implicits._
    // same para at (5,1) and (9,0): position inside the doc must not
    // beat document order — (5,1) wins
    val paras = Seq(
      (5L, 0, "unique a"), (5L, 1, "shared para"),
      (9L, 0, "shared para"), (9L, 1, "unique b"))
      .toDF("doc_id", "pos", "para")
    val kept = ParaDedup.dedupKeepFirst(paras)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(kept == Seq((5L, 0), (5L, 1), (9L, 1)))
  }

  test("incremental keep-first == batch keep-first with history ranked first") {
    val s = spark
    import s.implicits._
    // history owns "shared h"; batch has an internal dup ("shared b"),
    // a history dup, and unique paras. The incremental result over the
    // LEDGER must equal the batch form run over history ∪ new with
    // history given rank priority.
    val history = Seq(
      (100L, 0, "shared h"), (100L, 1, "h only"),
      (101L, 0, "shared h")) // ledger dups are harmless
      .toDF("doc_id", "pos", "para")
    val batch = Seq(
      (1L, 0, "shared h"),   // dup of history -> dropped
      (1L, 1, "fresh a"),
      (2L, 0, "shared b"), (2L, 1, "fresh c"),
      (3L, 0, "shared b"),   // intra-batch dup -> (2,0) wins
      (3L, 1, "fresh d"))
      .toDF("doc_id", "pos", "para")
    val ledger = ParaDedup.paragraphFingerprints(history)
    val inc = ParaDedup.incrementalKeepFirst(batch, ledger, "fp",
        expectedItems = 1024, fpp = 0.03)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(inc == Seq(
      (1L, 1, "fresh a"),
      (2L, 0, "shared b"), (2L, 1, "fresh c"),
      (3L, 1, "fresh d")))
    // reference: plain batch keep-first over the union with history
    // ranked ahead of every batch row, restricted to batch survivors
    val ref = ParaDedup.dedupKeepFirst(
        history.withColumn("doc_id", col("doc_id") - 200L).union(batch))
      .filter(col("doc_id") > 0)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(inc == ref, "incremental path must be a pure optimization")
  }

  test("reassembly preserves original paragraph order, not shuffle order") {
    val s = spark
    import s.implicits._
    val paras = (0 until 20).map(i => (1L, i, s"p$i")).reverse
      .toDF("doc_id", "pos", "para").repartition(8)
    val out = ParaDedup.reassemble(ParaDedup.dedupKeepFirst(paras))
      .collect().head
    assert(out.getString(1) == (0 until 20).map(i => s"p$i").mkString(" "))
    assert(out.getLong(2) == 20L)
  }
}
