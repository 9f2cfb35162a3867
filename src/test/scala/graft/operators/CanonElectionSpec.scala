package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CanonElectionSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("electCanonical: keep-longest, tie to smallest id, singleton self-canon") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, "one two"),          // cluster 1, 2 tokens
      (2L, "one two three"),    // cluster 1, 3 tokens -> canon
      (3L, "one"),              // cluster 1, 1 token
      (4L, "alone here"),       // no labels row: singleton self-canon
      (5L, "x y z"),            // cluster 5, tied at 3 tokens -> canon (id)
      (6L, "p q r")             // cluster 5
    ).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.electCanonical(tiny, labels, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 6) // total ledger: every doc exactly once
    assert(Seq(1L, 2L, 3L).forall(out(_).getAs[Long]("canon_id") == 2L))
    assert(out(4L).getAs[Long]("canon_id") == 4L)
    assert(out(4L).getAs[Boolean]("is_canon"))
    assert(Seq(5L, 6L).forall(out(_).getAs[Long]("canon_id") == 5L))
    assert(out.values.count(_.getAs[Boolean]("is_canon")) == 3)
  }

  test("electCanonical over dupClusters: one canon per cluster, canon is the max-token member") {
    graft.util.CacheScope.withScope {
      val labels = Dedup.dupClusters(Dedup.minhashLsh(docs, "doc_id", "text",
        shingleK = 3, numHashes = 6, rowsPerBand = 2))
      val out = graft.util.CacheScope.persist(
        Dedup.electCanonical(docs, labels, "doc_id", "text"))
      assert(out.count() == docs.count())
      // exactly one is_canon row per cluster
      val perCluster = out.groupBy(col("cluster_id"))
        .agg(sum(when(col("is_canon"), 1L).otherwise(0L)).as("n_canon"),
          max(col("n_tokens")).as("max_tokens"))
      assert(perCluster.filter(col("n_canon") =!= 1L).count() == 0)
      // the canon row carries the cluster's max token count
      val bad = out.filter(col("is_canon"))
        .join(perCluster, "cluster_id")
        .filter(col("n_tokens") =!= col("max_tokens"))
      assert(bad.count() == 0)
      // canon_id is always a member of its own cluster
      val members = out.select(col("cluster_id"), col("doc_id"))
      val orphans = out.select(col("cluster_id"), col("canon_id").as("doc_id"))
        .distinct()
        .join(members, Seq("cluster_id", "doc_id"), "left_anti")
      assert(orphans.count() == 0)
    }
  }

  test("electCanonical: deterministic under repartition") {
    val s = spark
    import s.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val tiny = Seq(
      (1L, "one two"), (2L, "one two three"), (3L, "one"),
      (4L, "alone here"), (5L, "x y z"), (6L, "p q r")
    ).toDF("doc_id", "text")
    val a = Dedup.electCanonical(tiny, labels, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.electCanonical(tiny.repartition(7), labels.repartition(3),
        "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
