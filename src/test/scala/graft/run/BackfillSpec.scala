package graft.run

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.ChartOps

class BackfillSpec extends SparkSpec {

  test("one-date backfill overwrites exactly that silver partition") {
    val s = spark
    import s.implicits._
    val base = tmpDir("backfill")
    val layout = Pipeline.Layout(s"$base/bronze", s"$base/silver", s"$base/gold")

    // two bronze dates from the same fixture
    val bronze = ChartOps.parsePayloads(payloadDf(Seq(
      ("2024-10-21", "us", resource("chart_us.json")),
      ("2024-10-22", "us", resource("chart_us.json")))))
    graft.ops.UnionOps.writeDailySnapshot(bronze, layout.bronzeDir)

    val eps = Seq(
      ("ep001aaaaaaaaaaaaaaaaa", "Morning News Daily", "v1"),
      ("ep002bbbbbbbbbbbbbbbbb", "True Crime Hour", "v1"),
      ("ep003ccccccccccccccccc", "Tech Talk Weekly", "v1"))
      .toDF("id", "name", "meta")
    Backfill.reprocessRange(spark, "2024-10-21", "2024-10-22", eps, layout)
    val silver = spark.read.parquet(layout.silverDir)
    assert(silver.count() == 6)

    // re-enrich ONLY the 22nd with updated metadata
    val epsV2 = eps.withColumn("meta", lit("v2"))
    Backfill.reprocessDate(spark, "2024-10-22", epsV2, layout)
    val after = spark.read.parquet(layout.silverDir)
    assert(after.count() == 6) // overwrite, not append
    assert(after.filter(col("date") === "2024-10-22" && col("meta") === "v2").count() == 3)
    assert(after.filter(col("date") === "2024-10-21" && col("meta") === "v1").count() == 3)
  }

  test("incremental gold processes only new silver files per run") {
    val s = spark
    import s.implicits._
    import graft.streaming.StreamingOps
    val base = tmpDir("incgold")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))

    // the monitored dir holds FLAT snapshot files (one per day, like the
    // reference's top_podcasts_YYYY-MM-DD.parquet layout)
    def addSnapshot(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = tmpDir("snap")
      df.coalesce(1).write.mode("overwrite").parquet(s"$scratch/out")
      val part = new java.io.File(s"$scratch/out").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/silver"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$base/silver/$name"))
    }

    addSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "day1.parquet")
    val run1 = StreamingOps.incrementalGold(spark, s"$base/silver",
      s"$base/gold", s"$base/ckpt", schema)
    assert(run1 == 2L)

    addSnapshot(Seq((3L, "c")).toDF("k", "v"), "day2.parquet")
    val run2 = StreamingOps.incrementalGold(spark, s"$base/silver",
      s"$base/gold", s"$base/ckpt", schema)
    assert(run2 == 1L) // only the new file — not the O(history) re-read

    val gold = spark.read.parquet(s"$base/gold")
    assert(gold.count() == 3)
  }

  test("gold upsert stream replaces a restated partition, appends new ones") {
    val s = spark
    import s.implicits._
    import graft.streaming.StreamingOps
    val base = tmpDir("upsert")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/silver"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("date",
        org.apache.spark.sql.types.StringType)))

    def addFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = tmpDir("upsnap")
      df.coalesce(1).write.mode("overwrite").parquet(s"$scratch/out")
      val part = new java.io.File(s"$scratch/out").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$base/silver/$name"))
    }

    addFlat(Seq((1L, "d1"), (2L, "d1")).toDF("k", "date"), "a.parquet")
    val n1 = StreamingOps.goldUpsertStream(spark, s"$base/silver",
      s"$base/gold", s"$base/ckpt", schema, "date")
    assert(n1 == 2L)

    // restate d1 (different rows, same partition) + add d2
    addFlat(Seq((9L, "d1")).toDF("k", "date"), "b.parquet")
    addFlat(Seq((3L, "d2")).toDF("k", "date"), "c.parquet")
    val n2 = StreamingOps.goldUpsertStream(spark, s"$base/silver",
      s"$base/gold", s"$base/ckpt", schema, "date")
    assert(n2 == 2L) // d1 REPLACED (1 row), d2 appended (1 row)
    val gold = spark.read.parquet(s"$base/gold")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gold == Set((9L, "d1"), (3L, "d2")))
  }
}
