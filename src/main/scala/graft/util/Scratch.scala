package graft.util

/** Process-scoped scratch directories with RECURSIVE cleanup at JVM
  * exit. `File.deleteOnExit` on a directory silently fails once
  * anything is written inside it (delete() refuses non-empty dirs), so
  * sink-roundtrip queries that write real tables into a scratch dir
  * (q39, q102) would leak a full table copy per invocation. Each dir
  * registered here is removed bottom-up by a single shutdown hook.
  */
object Scratch {

  private val registered =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(root)) {
            val st = java.nio.file.Files.walk(root)
            try {
              st.iterator().asScala.toSeq
                .sortBy(-_.getNameCount) // children before parents
                .foreach(p => { java.nio.file.Files.deleteIfExists(p); () })
            } finally st.close() // walk holds a directory-stream handle
          }
        } catch { case _: Throwable => () } // best-effort at shutdown
      }
    }))
  }

  /** Create a temp directory that is recursively deleted at JVM exit. */
  def dir(prefix: String): java.nio.file.Path = {
    hookInstalled
    val d = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(d)
    d
  }
}
