package graft.run

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the reference pipeline on the bundled
  * fixture payloads: bronze → silver → gold for one logical date, plus
  * the validation failure path.
  *
  * Usage: runMain graft.run.PipelineDemo <fixtureDir> <outDir>
  * (fixtureDir must contain chart_us.json / episodes_us.json —
  * src/test/resources has them.)
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(fixtureDir, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def res(p: String): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fixtureDir/$p")))

    // Ingest through the DataSource V2 connector (one payload row per
    // chart_<region>_<date>.json, one partition per "fetch"), exactly
    // as production would: the raw fixture is staged into a scratch
    // ingest dir first.
    val ingestDir = java.nio.file.Files.createTempDirectory("podchart_ingest")
    java.nio.file.Files.writeString(
      ingestDir.resolve("chart_us_2024-10-22.json"), res("chart_us.json"))
    val chart = spark.read.format("podchart").load(ingestDir.toString)
    val eps = Seq(("2024-10-22", "us", res("episodes_us.json")))
      .toDF("date", "region", "payload")
    val layout = Pipeline.Layout(
      s"$outDir/bronze", s"$outDir/silver", s"$outDir/gold")

    val silver = Pipeline.runDaily(spark, chart, eps, layout)
    println(s"SILVER_ROWS=${silver.count()}")
    silver.select("rank", "region", "episodeUri", "episodeName")
      .orderBy("rank").show(false)
    println(s"GOLD_ROWS=${Pipeline.rebuildGold(spark, layout).count()}")

    // failure path: remove one episode id -> totality check must throw
    val badEps = Seq(("2024-10-22", "us",
      res("episodes_us.json").replace("ep002bbbbbbbbbbbbbbbbb", "epXXXREMOVED")))
      .toDF("date", "region", "payload")
    try {
      Pipeline.runDaily(spark, chart, badEps, layout)
      println("VALIDATION=NO-THROW (BUG)")
    } catch {
      case e: graft.ops.EnrichOps.JoinValidationException =>
        println(s"VALIDATION=THREW ${e.getMessage.take(80)}")
    }
    spark.stop()
  }
}
