package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when
  * SQL-expressible) a DuckDB-runnable ANSI-SQL oracle over the same
  * parquet tables. Column names MUST match between the two — the
  * driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]
}

/** Testdata table reader. Tables are single parquet files named
  * `<table>.parquet` under the scale-factor directory the driver
  * passes in (see TESTDATA.md). Column pruning + predicate pushdown
  * happen in Catalyst because every query selects/filters on the
  * scan directly.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read as
    * a timestamp ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and
    * truncate to microsecond precision with integer arithmetic (`DIV`,
    * not `/` — epoch-nanos ≈ 1.7e18 overflows double's 2^53 mantissa).
    * Oracles must truncate the same way (`epoch_ns(ts) // 1000`).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
}
