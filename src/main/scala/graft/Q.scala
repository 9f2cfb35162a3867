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

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (readable only as a raw long via
    * `nanosAsLong`, truncated here to µs with integer `DIV` — epoch
    * nanos ≈ 1.7e18 overflows double's 2^53 mantissa) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read natively as
    * TIMESTAMP_NTZ). Both normalize to the SAME TimestampType micros
    * column — the NTZ wall time reinterprets in the UTC session, so
    * the micro values are identical either way, and the DuckDB oracles
    * (`epoch_us(ts)`) see the same instants unchanged. Branching on
    * the READ type (not the testdata generation) also keeps raw-long
    * spec fixtures working. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
