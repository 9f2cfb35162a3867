package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runner resilience semantics (SURVEY §2.12) — the engine-side
  * restatement of the reference DAG's execution guarantees:
  *
  *  - `retries = 2` with a fixed delay (`spotify_eps_dag.py:68`
  *    default_args) → [[withRetries]];
  *  - `max_active_runs = 1` single-writer protection
  *    (`spotify_eps_dag.py:66`) → [[withRunLock]], an atomic lock file
  *    next to the output (create-if-absent is atomic on POSIX and
  *    object stores with if-none-match semantics);
  *  - `trigger_rule = ALL_DONE` cleanup (`spotify_eps_backfill_dag.py:71`
  *    — temp-file removal runs whether upstream succeeded or failed)
  *    → the `cleanup` block of [[resilient]], executed in a finally.
  *
  * Retry safety leans on the sinks being idempotent (dynamic partition
  * overwrite, SaveMode.Overwrite): a failure mid-write leaves a partial
  * partition that the retry simply overwrites — same property the
  * reference gets from `replace=True` uploads.
  */
object Runner {

  final class ConcurrentRunException(msg: String) extends RuntimeException(msg)

  /** Run `body` with up to `retries` re-attempts after the first try
    * fails, sleeping `delayMillis` between attempts. `body` receives the
    * 0-based attempt number; `sleeper` is injectable so specs don't
    * sleep for real.
    *
    * Only NonFatal failures are retried: a fatal JVM error (OOM,
    * LinkageError) propagates immediately — retrying a half-dead JVM
    * converts one crash into `retries` crashes — and a cancellation
    * (InterruptedException) propagates with the thread's interrupt
    * status restored, so a cancelled run stops instead of sleeping and
    * retrying. */
  def withRetries[A](retries: Int = 2, delayMillis: Long = 60000L,
      sleeper: Long => Unit = Thread.sleep)(body: Int => A): A = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try return body(attempt)
      catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          throw ie
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt <= retries) sleeper(delayMillis)
      }
    }
    throw last
  }

  /** Single-writer guard: atomically create `lockPath`; if it already
    * exists another run is active → fail fast (the reference's
    * max_active_runs=1 queues instead, but a queued duplicate of a
    * daily batch is a no-op — rejecting is the batch-correct form).
    * The lock is always released, including on failure, so a crashed
    * run only needs its (empty) lock file removed to recover. */
  def withRunLock[A](lockPath: String)(body: => A): A = {
    val p = java.nio.file.Paths.get(lockPath)
    Option(p.getParent)
      .foreach(parent => { java.nio.file.Files.createDirectories(parent); () })
    try java.nio.file.Files.createFile(p)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentRunException(
          s"another run holds $lockPath (max_active_runs=1); " +
            "remove the file only if that run is known dead")
    }
    try body
    finally { java.nio.file.Files.deleteIfExists(p); () }
  }

  /** The full contract: single-writer lock around retried `body`, with
    * ALL_DONE `cleanup` that runs whether the body succeeded or not
    * (and before the lock releases). */
  def resilient[A](lockPath: String, retries: Int = 2,
      delayMillis: Long = 60000L, sleeper: Long => Unit = Thread.sleep)(
      body: => A)(cleanup: => Unit): A =
    withRunLock(lockPath) {
      try withRetries(retries, delayMillis, sleeper)(_ => body)
      finally cleanup
    }
}
