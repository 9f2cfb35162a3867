package graft.run

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** K3: the publish post-step (`kaggle.py:17-93`) — deliberately
  * OUT-OF-ENGINE (SURVEY §2.1: no Spark op should shell out), but the
  * artifact contract is provable offline: the gold directory is turned
  * into exactly what the reference's uploader ships — every CSV zipped
  * under its own basename and removed, a `dataset-metadata.json`
  * `{id, title, licenses:[{name}]}` envelope — and the network step is
  * a pluggable command runner (`kaggle datasets create|version`) that
  * production wires to ProcessBuilder and specs wire to a recorder.
  */
object Publisher {

  /** Zip every `.csv` under `dir` (recursively) to a sibling `.zip`
    * holding just the file under its basename, then delete the CSV —
    * the reference's zip_and_delete step (`kaggle.py:17-31`). Returns
    * the zip paths created. */
  def zipCsvFiles(dir: String): Seq[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new File(dir)).filter(_.getName.endsWith(".csv")).map { csv =>
      val zip = new File(csv.getPath.stripSuffix(".csv") + ".zip")
      val out = new ZipOutputStream(new FileOutputStream(zip))
      try {
        out.putNextEntry(new ZipEntry(csv.getName))
        val in = new FileInputStream(csv)
        try {
          val buf = new Array[Byte](8192)
          Iterator.continually(in.read(buf)).takeWhile(_ > 0)
            .foreach(n => out.write(buf, 0, n))
        } finally in.close()
        out.closeEntry()
      } finally out.close()
      csv.delete()
      zip.getPath
    }
  }

  /** `dataset-metadata.json` exactly as the reference writes it
    * (`kaggle.py:34-55`). */
  def writeMetadata(dir: String, datasetId: String, title: String,
      license: String = "CC1-1.0"): String = {
    val path = s"$dir/dataset-metadata.json"
    val json =
      s"""{"id": "$datasetId", "title": "$title", """ +
        s""""licenses": [{"name": "$license"}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      json.getBytes("UTF-8"))
    path
  }

  /** Stage the consolidated CSV for publishing: the FIRST `.csv` found
    * under `goldDir` (recursively — Spark sinks write part files in a
    * subdir) is copied into `stagingDir` under the canonical
    * `fileName`. No CSV → exception, mirroring the reference's
    * FileNotFoundError (`kaggle_update_dag.py:27-47`: list prefix, take
    * first CSV, download as top_podcasts.csv). */
  def stageGoldCsv(goldDir: String, stagingDir: String,
      fileName: String): String = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val csv = walk(new File(goldDir)).filter(_.getName.endsWith(".csv"))
      .sortBy(_.getPath).headOption
      .getOrElse(sys.error(s"no CSV files found under $goldDir"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stagingDir))
    val dest = java.nio.file.Paths.get(s"$stagingDir/$fileName")
    java.nio.file.Files.copy(csv.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest.toString
  }

  /** The whole update-DAG post-step: stage the gold CSV into a fresh
    * temp dir, publish a new version from it, and remove the staging
    * dir whether publish succeeded or not (the reference's ALL_DONE
    * cleanup task). */
  def publishFromGold(goldDir: String, datasetId: String, title: String,
      runDate: String, fileName: String = "top_podcasts.csv",
      runCommand: Seq[String] => Int = processRunner): Unit = {
    val staging =
      java.nio.file.Files.createTempDirectory("graft_publish").toString
    try {
      stageGoldCsv(goldDir, staging, fileName)
      publish(staging, datasetId, title, newVersion = true, runDate,
        runCommand)
      ()
    } finally {
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new File(staging))
    }
  }

  /** Default runner: actually execute the CLI (production path). */
  def processRunner(cmd: Seq[String]): Int =
    new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()

  /** [[processRunner]] with `dir` prepended to the executable search
    * path — the hook for vendored CLI installs, and what lets
    * PublisherSpec put a recording fake `kaggle` on the path and drive
    * the REAL subprocess route end-to-end (argv crosses an actual
    * process boundary, exit codes propagate) with no network. The head
    * of the command resolves against `dir` EXPLICITLY: the JVM's
    * ProcessBuilder looks executables up with the parent's PATH, so
    * merely editing the child environment's PATH would not redirect
    * resolution. */
  def processRunnerWithPath(dir: String): Seq[String] => Int = cmd => {
    val local = new File(dir, cmd.head)
    val resolved =
      if (local.isFile && local.canExecute) local.getPath +: cmd.tail
      else cmd
    val pb = new ProcessBuilder(resolved: _*).inheritIO()
    val env = pb.environment()
    env.put("PATH",
      dir + File.pathSeparator + Option(env.get("PATH")).getOrElse(""))
    pb.start().waitFor()
  }

  /** Full publish post-step: zip CSVs, write metadata, invoke the
    * publisher CLI — `create` for a new dataset, `version` (with the
    * reference's dated message and `-r zip`) for an update. `runDate`
    * is injected, never `LocalDate.now()`, same reasoning as the
    * pipeline's logical dates. Non-zero runner exit → exception, like
    * the reference's check=True. */
  def publish(dir: String, datasetId: String, title: String,
      newVersion: Boolean, runDate: String,
      runCommand: Seq[String] => Int = processRunner): Seq[String] = {
    zipCsvFiles(dir)
    writeMetadata(dir, datasetId, title)
    val cmd =
      if (newVersion)
        Seq("kaggle", "datasets", "version", "-p", dir,
          "-m", s"$runDate Update", "-r", "zip")
      else Seq("kaggle", "datasets", "create", "-p", dir)
    val exit = runCommand(cmd)
    if (exit != 0) sys.error(s"publish command failed with exit $exit: " +
      cmd.mkString(" "))
    cmd
  }
}
