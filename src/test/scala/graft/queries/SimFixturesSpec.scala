package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The gate's stored-fixture lane: build-once semantics, exact parquet
  * round-trip, and the flat-graph ≡ layer-0-slice identity the whole
  * flat family serves through. */
class SimFixturesSpec extends SparkSpec {

  test("stored(): builds once per (dir, name); later calls read the parquet") {
    val s = spark
    import s.implicits._
    var builds = 0
    val dir = tmpDir("graft_fixprobe")
    def get() = SimFixtures.stored(s, dir, "probe") {
      builds += 1
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    }
    val first = get().orderBy("a").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val second = get().orderBy("a").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(builds == 1, s"build ran $builds times — must run once per JVM")
    assert(first == Seq((1L, 2L), (3L, 4L)) && first == second,
      s"round-trip drifted: $first vs $second")
  }

  test("flatGraph ≡ the from-scratch knnGraphSeed (the layer-0 slice identity)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val coarse = graft.operators.Ivf.centroids(e, "vec_id", "embedding",
      8, 2)
    val direct = graft.operators.Similarity.knnGraphSeed(coarse, e,
        "vec_id", "embedding", 5)
      .orderBy("src", "rnk").collect().toSeq
    val stored = SimFixtures.flatGraph(s, dir)
      .orderBy("src", "rnk").collect().toSeq
    assert(stored == direct,
      "the stored layer-0 slice diverged from the from-scratch seed")
  }
}
