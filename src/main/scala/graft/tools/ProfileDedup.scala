package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing for the dedup pipeline — where does a cold
  * propose/verify run spend its time at a given SF? Dev tool, not part
  * of the engine surface. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import graft.operators.Dedup

    def time(label: String)(body: => Long): Unit = {
      // min of 2, cache-cleared between runs: cold steady-state cost
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = graft.util.CacheScope.withScope(body)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  $label%-38s $dt%6.2f s  (n=$n)")
        dt
      }
      once(); once()
      ()
    }

    println(s"== $dir, ${docs.count()} docs")
    time("words+shingles explode (count)") {
      docs.select(col("doc_id"), Dedup.words(col("text")).as("__w"))
        .select(explode(Dedup.wordShingles(col("__w"), 3)).as("sh")).count()
    }
    time("native signatures (count)") {
      Dedup.minhashSignaturesNative(docs, "doc_id", "text", 3, 6).count()
    }
    time("bands (count)") {
      Dedup.lshBands(
        Dedup.minhashSignaturesNative(docs, "doc_id", "text", 3, 6), 6, 2)
        .count()
    }
    time("minhashLsh pairs (count)") {
      Dedup.minhashLsh(docs, "doc_id", "text").count()
    }
    time("proposeVerify (count)") {
      Dedup.proposeVerify(docs, "doc_id", "text").count()
    }
    time("simhash native sigs (count)") {
      Dedup.simhash32Native(docs, "doc_id", "text", 3).count()
    }
    time("simhash pairs (count)") {
      Dedup.simhashPairs(
        Dedup.simhash32Native(docs, "doc_id", "text", 3), 6).count()
    }
    spark.stop()
  }
}

object ExplainSig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.operators.Dedup
      .minhashSignaturesNative(docs, "doc_id", "text", 3, 6)
      .queryExecution.optimizedPlan.toString
    println("SPLIT_COUNT=" + "split\\(".r.findAllIn(plan).length)
    println(plan.take(3000))
    spark.stop()
  }
}
