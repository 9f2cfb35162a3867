package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one streaming gate query repeatedly in one JVM to
  * separate cold-start (codegen, listing) from the per-drain fixed cost
  * (micro-batch planning, state-store commits, sink collect) — the
  * number BASELINE.md's streaming floor should quote.
  * Usage: runMain graft.tools.StreamFixedCost <sfDir> <queryKey> [n]
  */
object StreamFixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qkey = if (args.length > 1) args(1) else "q30"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries.find(_._1.startsWith(qkey)).get._2
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[fixed] pass=$i t=$dt%.2fs rows=$rows")
      dt
    }
    println(f"[fixed] $qkey cold=${times.head}%.2f warmMin=${times.tail.min}%.2f")
    spark.stop()
  }
}
