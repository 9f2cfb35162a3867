package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession per suite (SURVEY §5.2). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", SparkSpec.warehouseDir)
    .getOrCreate()

  def resource(name: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(
      getClass.getClassLoader.getResource(name).toURI))

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Payload frame for ChartOps/EpisodeOps parsers. */
  def payloadDf(rows: Seq[(String, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("date", "region", "payload")
  }
}

object SparkSpec {
  /** One warehouse per JVM: the builder conf only takes effect for the
    * suite that creates the session first — per-suite temp dirs would
    * leak and mislead (getOrCreate ignores configs on a live session). */
  lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft_wh").toString
}
