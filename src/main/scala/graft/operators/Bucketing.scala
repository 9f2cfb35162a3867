package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY §4 / prompt scale notes): writing
  * both sides of a recurring join bucketed by the join key lets Spark
  * plan a SortMergeJoin with ZERO Exchange — the shuffle is paid once at
  * write time and amortized over every subsequent join. This is the
  * 100 TB answer for fact-to-fact joins where neither side broadcasts
  * (e.g. daily chart snapshots ⋈ episode history, or re-joining dedup
  * candidate tables round after round).
  */
object Bucketing {

  /** Persist a frame bucketed (and sorted) by the join key into the
    * session catalog's warehouse. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts Catalyst plans no Exchange on either side. */
  def joinBucketed(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** True when the executed plan contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")
}
