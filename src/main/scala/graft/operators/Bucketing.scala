package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table co-location (SURVEY §4 / prompt scale notes): writing
  * both sides of a recurring join bucketed by the join key lets Spark
  * plan a SortMergeJoin with ZERO shuffle Exchange — the shuffle is paid
  * once at write time and amortized over every subsequent join. This is
  * the 100 TB answer for fact-to-fact joins where neither side
  * broadcasts (e.g. daily chart snapshots ⋈ episode history, or
  * re-joining dedup candidate tables round after round).
  *
  * Catalog caveat: with the default in-memory catalog the bucketing
  * METADATA lives only as long as the SparkSession — the parquet files
  * survive but a new application must re-register the table. In a real
  * deployment back the session with a persistent metastore so the
  * amortization crosses application runs.
  */
object Bucketing {

  /** Persist a frame bucketed (and sorted) by the join key. The
    * explicit repartition aligns input partitions with bucket ids
    * (both are pmod(murmur3, n)), so each task writes exactly one file
    * per bucket — without it, every upstream task writes a file per
    * bucket (tasks×buckets small files) and multi-file buckets forfeit
    * the sortBy guarantee. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.repartition(numBuckets, col(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
    // explicit path → external table (files live there, metadata in the
    // catalog); default → managed under spark.sql.warehouse.dir
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. Validates that both
    * sides really are bucketed on the join key with equal bucket counts
    * — otherwise Catalyst silently degrades to a shuffle join, which is
    * exactly what this helper exists to avoid. */
  def joinBucketed(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    def spec(t: String, k: String): Int = {
      val s = Bridge.bucketSpec(spark, t).getOrElse(
        throw new IllegalArgumentException(s"table $t is not bucketed"))
      require(s._2 == Seq(k),
        s"table $t is bucketed by ${s._2.mkString(",")}, not $k")
      s._1
    }
    val (nl, nr) = (spec(leftTable, leftKey), spec(rightTable, rightKey))
    require(nl == nr,
      s"bucket counts differ ($leftTable=$nl, $rightTable=$nr): " +
        "the join would silently shuffle")
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** True when the executed plan contains a SHUFFLE exchange.
    * BroadcastExchange is not a shuffle and must not trip the check
    * (ReusedExchange conservatively counts — a reused shuffle still
    * shuffled once). */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString
      .replace("BroadcastExchange", "")
      .contains("Exchange")
}
