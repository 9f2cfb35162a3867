package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one streaming drain and dump per-micro-batch progress
  * (batch id, duration breakdown, state rows) so fixed-cost work in the
  * AvailableNow harness queries is measurable rather than guessed.
  * Usage: runMain graft.tools.StreamProbe <sfDir> <queryKey>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qkey = if (args.length > 1) args(1) else "q49"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} " +
          s"state=${p.stateOperators.map(s => s"rows=${s.numRowsTotal} commit=${s.commitTimeMs}ms").mkString(";")}")
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val fn = graft.SparkEntry.queries.find(_._1.startsWith(qkey)).get._2
    val n = fn(spark, sfDir).count()
    println(f"[probe] total=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    spark.stop()
  }
}
