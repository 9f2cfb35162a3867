package graft.tools
import org.apache.spark.sql.SparkSession
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.contains("stream")) {
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).length
          val bcasts = "BroadcastExchange".r.findAllIn(plan).length
          println(f"SHUF $name%-34s shuffle=$shuffles%2d broadcast=$bcasts%2d")
        } catch { case e: Throwable => println(s"SHUF $name ERR ${e.getMessage.take(60)}") }
      }
    }
    spark.stop()
  }
}
