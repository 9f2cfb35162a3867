package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot union + sinks (SURVEY.md §2: S5, U1/U2, P7, K1, K2).
  *
  * Reference: list S3 keys, download every daily parquet, `pd.concat`
  * aligning columns by name with NaN fill (`spotify_eps_dag.py:42-60`).
  * Spark replaces the whole loop with one multi-file scan; schema drift
  * across days is handled by `mergeSchema` (scan path) or
  * `unionByName(allowMissingColumns)` (in-memory path).
  */
object UnionOps {

  /** U1/U2: drift-tolerant union of already-loaded frames — missing
    * columns null-fill by name, like pandas concat. */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** S5+P7+U2 as a single scan: Spark lists the directory, prunes
    * non-parquet keys (`pathGlobFilter` = the reference's `.endswith`
    * check), merges drifted footers, and parallelizes the read — the
    * reference's per-file download loop disappears. */
  def readSnapshots(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("mergeSchema", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)

  /** K1: idempotent per-date snapshot (the reference's `replace=True`
    * upload, `spotify_eps_dag.py:32`) — dynamic partition overwrite of
    * a date-partitioned table, never a blind append. */
  def writeDailySnapshot(df: DataFrame, tableDir: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date")
      .mode(SaveMode.Overwrite)
      .parquet(tableDir)

  /** Scale-disciplined parquet sink: range-partition on the sort key so
    * output files are BOTH bounded in size (`maxRecordsPerFile` splits
    * oversized partitions) and internally sorted — parquet min/max
    * stats then prune row groups on read for range predicates over the
    * key. The 100 TB alternative to `coalesce(1)`-style sinks: file
    * count scales with data, never with task count (no tasks×partitions
    * small-file explosion), and no single-task bottleneck. */
  def writeSized(df: DataFrame, path: String, sortCol: String,
      maxRecordsPerFile: Long, numRanges: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numRanges, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** K2: consolidated CSV (`spotify_eps_dag.py:58-60`). `coalesce(1)`
    * reproduces the reference's single-file contract for Kaggle; at
    * 100 TB one would drop the coalesce and publish a sharded dataset
    * (SURVEY §4: the daily full rebuild is the reference's scaling
    * cliff — prefer the date-partitioned gold table + incremental append).
    */
  def writeGoldCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    // CSV cannot carry ARRAY/STRUCT columns — serialize them to JSON
    // strings at the sink boundary (pandas to_csv stringifies lists the
    // same way, `spotify_eps_dag.py:58`; columns stay typed upstream).
    import org.apache.spark.sql.functions.{col, to_json}
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val flat = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType =>
          to_json(col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }.toSeq: _*)
    val out = if (singleFile) flat.coalesce(1) else flat
    out.write.option("header", "true").mode(SaveMode.Overwrite).csv(path)
  }
}
