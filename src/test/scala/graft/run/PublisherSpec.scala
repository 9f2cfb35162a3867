package graft.run

import graft.SparkSpec

class PublisherSpec extends SparkSpec {

  private def writeCsv(dir: String, name: String, content: String): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val p = java.nio.file.Paths.get(s"$dir/$name")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  private def readZipEntry(zipPath: String): (String, String) = {
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val e = zf.entries().nextElement()
      val content = new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      (e.getName, content)
    } finally zf.close()
  }

  test("zip-and-delete: each CSV becomes a zip of its basename") {
    val dir = tmpDir("pub")
    writeCsv(dir, "top_podcasts.csv", "a,b\n1,2\n")
    writeCsv(s"$dir/nested", "extra.csv", "x\ny\n")
    writeCsv(dir, "keep.txt", "not a csv")
    val zips = Publisher.zipCsvFiles(dir).sorted
    assert(zips.map(new java.io.File(_).getName).toSet ==
      Set("top_podcasts.zip", "extra.zip"))
    assert(!new java.io.File(s"$dir/top_podcasts.csv").exists())
    assert(new java.io.File(s"$dir/keep.txt").exists())
    val (entry, content) = readZipEntry(s"$dir/top_podcasts.zip")
    assert(entry == "top_podcasts.csv" && content == "a,b\n1,2\n")
  }

  test("publish: metadata envelope + versioned CLI invocation, no network") {
    val dir = tmpDir("pubfull")
    writeCsv(dir, "gold.csv", "k,v\n1,a\n")
    var recorded = Seq.empty[Seq[String]]
    Publisher.publish(dir, "user/top-podcasts", "Top Podcasts",
      newVersion = true, runDate = "2026-08-12",
      runCommand = cmd => { recorded :+= cmd; 0 })
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/dataset-metadata.json")), "UTF-8")
    assert(meta == """{"id": "user/top-podcasts", "title": "Top Podcasts", """ +
      """"licenses": [{"name": "CC1-1.0"}]}""")
    assert(recorded == Seq(Seq("kaggle", "datasets", "version", "-p", dir,
      "-m", "2026-08-12 Update", "-r", "zip")))
    assert(new java.io.File(s"$dir/gold.zip").exists())
  }

  test("publish: non-zero runner exit fails the step (check=True)") {
    val dir = tmpDir("pubfail")
    writeCsv(dir, "gold.csv", "k\n1\n")
    val e = intercept[RuntimeException] {
      Publisher.publish(dir, "u/d", "t", newVersion = false,
        runDate = "2026-08-12", runCommand = _ => 1)
    }
    assert(e.getMessage.contains("exit 1"))
  }

  test("stage + publish from gold: canonical name, cleanup on failure, no CSV fails") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pubstage")
    graft.ops.UnionOps.writeGoldCsv(Seq((1L, "x")).toDF("k", "v"), s"$dir/gold")
    var staged = Seq.empty[String]
    Publisher.publishFromGold(s"$dir/gold", "u/d", "t", "2026-08-12",
      runCommand = cmd => {
        val stagingDir = cmd(cmd.indexOf("-p") + 1)
        staged = new java.io.File(stagingDir).listFiles().map(_.getName).toSeq
        0
      })
    assert(staged.contains("top_podcasts.zip")) // canonical name, zipped
    assert(staged.contains("dataset-metadata.json"))
    // failure still cleans the staging dir (ALL_DONE) and propagates
    var failedStaging = ""
    intercept[RuntimeException] {
      Publisher.publishFromGold(s"$dir/gold", "u/d", "t", "2026-08-12",
        runCommand = cmd => { failedStaging = cmd(cmd.indexOf("-p") + 1); 1 })
    }
    assert(!new java.io.File(failedStaging).exists())
    // empty gold dir -> the reference's FileNotFoundError analog
    val empty = tmpDir("pubempty")
    val e = intercept[RuntimeException] {
      Publisher.publishFromGold(empty, "u/d", "t", "2026-08-12",
        runCommand = _ => 0)
    }
    assert(e.getMessage.contains("no CSV files"))
  }

  // ------------------------------------------------- real CLI subprocess
  // r5 advice: the recorder lambdas above never execute processRunner
  // itself, so the one reference behavior left unexercised was the
  // actual subprocess invocation. A fake `kaggle` on a prepended PATH
  // records its argv byte-for-byte (NUL-delimited, so embedded spaces
  // in "-m <date> Update" can't mask a quoting bug) and exits as told.

  private def fakeKaggle(exitCode: Int): (String, java.io.File) = {
    val binDir = tmpDir("fakebin")
    val record = new java.io.File(binDir, "argv.bin")
    val script = new java.io.File(binDir, "kaggle")
    val body = "#!/bin/sh\n" +
      s"""for a in "$$@"; do printf '%s\\0' "$$a" >> '${record.getPath}'; done\n""" +
      s"exit $exitCode\n"
    java.nio.file.Files.write(script.toPath, body.getBytes("UTF-8"))
    script.setExecutable(true)
    (binDir, record)
  }

  private def recordedArgv(record: java.io.File): Seq[String] = {
    val raw = new String(java.nio.file.Files.readAllBytes(record.toPath), "UTF-8")
    raw.split('\u0000').toSeq // NUL-delimited; trailing empties dropped
  }

  test("create: the real subprocess path invokes the CLI with the reference argv") {
    val (binDir, record) = fakeKaggle(exitCode = 0)
    val dir = tmpDir("pubcli")
    writeCsv(dir, "gold.csv", "k\n1\n")
    val cmd = Publisher.publish(dir, "u/d", "t", newVersion = false,
      runDate = "2026-08-12",
      runCommand = Publisher.processRunnerWithPath(binDir))
    assert(cmd.head == "kaggle")
    // kaggle.py:67 — `kaggle datasets create -p '<folder>'`
    assert(recordedArgv(record) == Seq("datasets", "create", "-p", dir))
  }

  test("version: the real subprocess path carries the dated message and -r zip") {
    val (binDir, record) = fakeKaggle(exitCode = 0)
    val dir = tmpDir("pubcliv")
    writeCsv(dir, "gold.csv", "k\n1\n")
    Publisher.publish(dir, "u/d", "t", newVersion = true,
      runDate = "2026-08-12",
      runCommand = Publisher.processRunnerWithPath(binDir))
    // kaggle.py:85-86 — `kaggle datasets version -p '<folder>'
    //                    -m '<today> Update' -r zip`
    assert(recordedArgv(record) == Seq("datasets", "version", "-p", dir,
      "-m", "2026-08-12 Update", "-r", "zip"))
  }

  test("a failing CLI subprocess propagates its exit code into the failure") {
    val (binDir, _) = fakeKaggle(exitCode = 3)
    val dir = tmpDir("pubclifail")
    writeCsv(dir, "gold.csv", "k\n1\n")
    val e = intercept[RuntimeException] {
      Publisher.publish(dir, "u/d", "t", newVersion = false,
        runDate = "2026-08-12",
        runCommand = Publisher.processRunnerWithPath(binDir))
    }
    assert(e.getMessage.contains("exit 3"))
  }

  test("the gold CSV the pipeline writes is publishable as-is") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pubgold")
    graft.ops.UnionOps.writeGoldCsv(
      Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("k", "tags"),
      s"$dir/gold")
    var cmds = 0
    Publisher.publish(s"$dir/gold", "u/d", "t", newVersion = false,
      runDate = "2026-08-12", runCommand = _ => { cmds += 1; 0 })
    val files = new java.io.File(s"$dir/gold").listFiles().map(_.getName)
    assert(files.count(_.endsWith(".zip")) == 1)
    assert(!files.exists(_.endsWith(".csv")))
    assert(files.contains("dataset-metadata.json"))
    assert(cmds == 1)
    // the zipped CSV still carries the JSON-serialized array column
    // (Spark's CSV writer escapes embedded quotes with backslash)
    val zip = new java.io.File(s"$dir/gold").listFiles()
      .find(_.getName.endsWith(".zip")).get
    val (_, content) = readZipEntry(zip.getPath)
    assert(content.contains("\"[\\\"a\\\",\\\"b\\\"]\""))
  }
}
