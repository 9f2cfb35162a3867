package graft.run

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.ChartOps

class RunnerSpec extends SparkSpec {

  test("retries: succeeds on attempt 3 of retries=2; delays recorded") {
    var sleeps = List.empty[Long]
    var calls = 0
    val out = Runner.withRetries(retries = 2, delayMillis = 7L,
        sleeper = d => sleeps ::= d) { attempt =>
      calls += 1
      if (attempt < 2) sys.error(s"boom $attempt")
      "ok"
    }
    assert(out == "ok" && calls == 3 && sleeps == List(7L, 7L))
  }

  test("retries exhausted: last error propagates, no extra sleep") {
    var sleeps = 0
    val e = intercept[RuntimeException] {
      Runner.withRetries(retries = 2, delayMillis = 1L,
        sleeper = _ => sleeps += 1)(a => sys.error(s"fail $a"): String)
    }
    assert(e.getMessage == "fail 2" && sleeps == 2)
  }

  test("single-writer lock: concurrent entry rejected, released on exit") {
    val lock = s"${tmpDir("runlock")}/run.lock"
    Runner.withRunLock(lock) {
      intercept[Runner.ConcurrentRunException] {
        Runner.withRunLock(lock)(fail("second writer must not enter"))
      }
    }
    // released on success -> re-entry works
    assert(Runner.withRunLock(lock)(42) == 42)
    // released on FAILURE too -> re-entry after a crash-free failure works
    intercept[RuntimeException] { Runner.withRunLock(lock)(sys.error("die")) }
    assert(Runner.withRunLock(lock)(43) == 43)
  }

  test("ALL_DONE cleanup runs when the body fails") {
    var cleaned = false
    val lock = s"${tmpDir("cleanlock")}/run.lock"
    intercept[RuntimeException] {
      Runner.resilient(lock, retries = 0, delayMillis = 0L, _ => ())(
        sys.error("die"): Unit) { cleaned = true }
    }
    assert(cleaned)
  }

  test("failure-mid-write: retry overwrites the partial partition (idempotent sink)") {
    val s = spark
    import s.implicits._
    val base = tmpDir("resilient")
    val layout = Pipeline.Layout(s"$base/bronze", s"$base/silver", s"$base/gold")
    val charts = payloadDf(Seq(("2024-10-22", "us", resource("chart_us.json"))))
    val eps = resource("episodes_us.json")
    val epsDf = Seq(eps).toDF("payload")

    // attempt 0 dies AFTER writing a poisoned bronze partition (the
    // mid-write state); attempt 1 runs the real pipeline over the same
    // logical date — dynamic overwrite must repair, not append.
    var attempt = 0
    val out = Runner.resilient(s"${layout.silverDir}.lock", retries = 2,
        delayMillis = 0L, _ => ()) {
      if (attempt == 0) {
        attempt += 1
        Seq(("2024-10-22", "us", -1)).toDF("date", "region", "rank")
          .write.partitionBy("date")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(layout.bronzeDir)
        sys.error("died mid-write")
      }
      Pipeline.runDaily(spark, charts, epsDf, layout)
    } { () }
    assert(out.count() > 0)
    val bronze = spark.read.parquet(layout.bronzeDir)
    assert(bronze.filter(col("rank") === -1).count() == 0) // partial state gone
    assert(spark.read.parquet(layout.silverDir)
      .filter(col("date") === "2024-10-22").count() == out.count())
    // lock released after the run
    assert(!new java.io.File(s"${layout.silverDir}.lock").exists())
  }
}
