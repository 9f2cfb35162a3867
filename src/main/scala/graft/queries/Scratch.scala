package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

// temporary profiling harness — not registered, removed before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.util.CacheScope.withScope {
      val e = Tables(spark, dir, "embeddings")
      timed("fixtures build") {
        SimFixtures.coarseF(spark, dir).count()
        SimFixtures.flatIndexF(spark, dir).count()
        SimFixtures.layeredSeedF(spark, dir).count()
        SimFixtures.prunedLayeredF(spark, dir).count()
      }
      val coarse = SimFixtures.coarseF(spark, dir)
      val idx = SimFixtures.flatIndexF(spark, dir)
      val lg0 = SimFixtures.layeredSeedF(spark, dir)
      val lp0 = SimFixtures.prunedLayeredF(spark, dir)
      val batchIndex = graft.util.CacheScope.persist(
        graft.operators.Ivf.flatIndex(coarse,
          e.filter(col("vec_id") % 307 === 0)
            .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
          "vec_id", "embedding", Nil))
      timed("batchIndex") { batchIndex.count() }
      val up = timed("upsertLayeredKnnSeed + checkpoint") {
        graft.operators.Similarity.upsertLayeredKnnSeed(lg0, idx,
          batchIndex, 5, 2).localCheckpoint()
      }
      timed("upserted count") { up.count() }
      timed("full upsertPrunedLayeredKnnSeed collect") {
        graft.operators.Similarity.upsertPrunedLayeredKnnSeed(lg0, lp0,
          idx, batchIndex, k = 5, maxLayer = 2)
          .orderBy(col("layer"), col("src"), col("rnk")).collect()
      }
    }
    spark.stop()
  }
}
