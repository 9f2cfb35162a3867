package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("zValue is a bijective Morton interleave") {
    val s = spark
    import s.implicits._
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect()
    // reference de-interleave on the driver
    def deinterleave(z: Long): (Int, Int) = {
      var (x, y) = (0, 0)
      for (j <- 0 until Layout.ZBits) {
        x |= (((z >> (2 * j)) & 1L) << j).toInt
        y |= (((z >> (2 * j + 1)) & 1L) << j).toInt
      }
      (x, y)
    }
    got.foreach { r =>
      assert(deinterleave(r.getLong(2)) == (r.getInt(0), r.getInt(1)))
    }
    assert(got.map(_.getLong(2)).distinct.length == pts.length)
  }

  test("z-ordered files bound BOTH dimensions; single-key sort does not") {
    val s = spark
    import s.implicits._
    // uniform 256x256 grid: single-key sort gives each file the full
    // y-range; z-order confines each file to a quadrant-ish box
    val grid = for (x <- 0 until 256; y <- 0 until 256) yield (x, y)
    val df = grid.toDF("x", "y")
    val zdir = tmpDir("zorder")
    Layout.writeZOrdered(df, "x", "y", numFiles = 16, path = zdir)
    // pruning semantics, as a min/max-stats reader would evaluate them:
    // which files could contain rows in a 32-wide band on each dim?
    // (a few z-runs straddle quadrant boundaries and go wide — that is
    // inherent to the curve — so the claim is about file COUNTS pruned,
    // not a universal per-file span bound)
    def retained(dirPath: String, dim: String, lo: Int, hi: Int): Int =
      spark.read.parquet(dirPath)
        .withColumn("file", input_file_name())
        .groupBy("file").agg(min(dim).as("mn"), max(dim).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count().toInt
    val zFiles = spark.read.parquet(zdir)
      .select(input_file_name()).distinct().count().toInt
    assert(zFiles == 16)
    // aligned 1/16 z-runs give 4 hits per band; RangePartitioner
    // boundaries are SAMPLED (non-deterministic across runs), and each
    // boundary-straddling file can widen its span into the band — so
    // the bound carries slack. The discriminating claim is a strict
    // minority on BOTH dims (x-sort below retains 16/16 on y).
    val zX = retained(zdir, "x", 96, 103)
    val zY = retained(zdir, "y", 96, 103)
    assert(zX <= 12 && zY <= 12,
      s"z-order retained $zX/$zFiles files on an x-band, $zY on a y-band" +
        " — expected a minority on BOTH dims")
    // contrast: the same data sorted by x alone — perfect on x, but a
    // y-band predicate retains EVERY file
    val xdir = tmpDir("xsort")
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xdir)
    assert(retained(xdir, "x", 96, 103) <= 4)
    assert(retained(xdir, "y", 96, 103) == 16,
      "x-sorted layout unexpectedly bounded y — test premise broken")
  }

  test("date-partitioned write prunes to the selected partitions at plan time") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("prune")
    (1 to 300).map(i => (i.toLong, f"2024-01-${i % 30 + 1}%02d"))
      .toDF("id", "event_date")
      .withColumn("event_date", to_date(col("event_date")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir)
      .filter(col("event_date").between("2024-01-05", "2024-01-07"))
    val scan = read.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    // the date predicate must land in PartitionFilters (planning-time
    // directory pruning), not in the row-level data filters
    assert(scanStr.contains("PartitionFilters"), scanStr)
    val partFilters = scanStr.split("PartitionFilters:")(1)
    assert(partFilters.contains("event_date"), scanStr)
    // and the selected file set is exactly the 3 matching directories
    val files = read.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(f => (5 to 7).exists(d => f.contains(f"2024-01-$d%02d"))),
      files.mkString("\n"))
  }

  test("compactLatest: latest segment wins; layout is cell-clustered and sorted") {
    val s = spark
    import s.implicits._
    // ids 1..100 in seg 0; 1..50 restated in seg 1; 1..20 in seg 2 —
    // payload encodes (id, seg) so the winner is verifiable
    val segs = Seq(
      (1 to 100).map(i => (i.toLong, 0, i % 7L, s"v0-$i")),
      (1 to 50).map(i => (i.toLong, 1, (i + 1) % 7L, s"v1-$i")),
      (1 to 20).map(i => (i.toLong, 2, (i + 2) % 7L, s"v2-$i"))
    ).flatten.toDF("id", "seg", "cell", "payload")
    val numParts = 4
    val got = Layout.compactLatest(segs, "id", "seg", "cell", numParts)
    val rows = got.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getString(3))).toSeq
    assert(rows.length == 100, "compaction must emit exactly one row per id")
    rows.foreach { case (id, seg, _, payload) =>
      val want = if (id <= 20) 2 else if (id <= 50) 1 else 0
      assert(seg == want && payload == s"v$want-$id",
        s"id $id served seg $seg/$payload, wanted seg $want")
    }
    // physical claims: exactly numParts partitions, each cell wholly
    // inside one partition, rows sorted (cell, id) within partitions
    val perPart = got.select(spark_partition_id().as("p"), col("cell"),
        col("id")).collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(perPart.map(_._1).distinct.length <= numParts)
    assert(perPart.groupBy(_._2).forall(_._2.map(_._1).distinct.length == 1),
      "a cell was split across partitions")
    perPart.groupBy(_._1).foreach { case (_, ps) =>
      // collect() preserves within-partition order per partition
      val keys = ps.map(t => (t._2, t._3)).toSeq
      assert(keys == keys.sorted, "rows not sorted (cell, id) within a partition")
    }
  }

  test("compactAsOf: snapshot reads ignore later restatements; as-of max ≡ latest") {
    val s = spark
    import s.implicits._
    val segs = Seq(
      (1L, 0, 1L, "v0"), (2L, 0, 1L, "v0"),
      (1L, 1, 1L, "v1"),
      (1L, 2, 1L, "v2"), (2L, 2, 1L, "v2"))
      .toDF("id", "seg", "cell", "payload")
    def rows(asOf: Int) = Layout
      .compactAsOf(segs, "id", "seg", "cell", 2, asOf)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq.sorted
    assert(rows(0) == Seq((1L, "v0"), (2L, "v0")))
    assert(rows(1) == Seq((1L, "v1"), (2L, "v0")),
      "as-of 1 must see seg 1's restatement of id 1 but NOT seg 2's")
    val latest = Layout.compactLatest(segs, "id", "seg", "cell", 2)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq.sorted
    assert(rows(2) == latest, "as-of the max segment must equal latest")
  }

  test("compactLatest raises on a duplicate (id, seg) pair") {
    val s = spark
    import s.implicits._
    val corrupt = Seq((1L, 0, 1L, "a"), (1L, 0, 1L, "b"), (2L, 0, 1L, "c"))
      .toDF("id", "seg", "cell", "payload")
    val e = intercept[Exception] {
      Layout.compactLatest(corrupt, "id", "seg", "cell", 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("duplicate"))),
      s"expected the duplicate guard to fire, got: $e")
  }

  test("compactLatest raises on a duplicate pair among OLDER segments") {
    val s = spark
    import s.implicits._
    // id 1's duplicate is at seg 0 while seg 2 wins the election — the
    // whole-ledger guard must still fire (the elected row itself is
    // unambiguous, but the ledger is corrupt)
    val corrupt = Seq((1L, 0, 1L, "a"), (1L, 0, 1L, "b"), (1L, 2, 1L, "c"),
        (2L, 0, 1L, "d"))
      .toDF("id", "seg", "cell", "payload")
    val e = intercept[Exception] {
      Layout.compactLatest(corrupt, "id", "seg", "cell", 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("duplicate"))),
      s"expected the whole-ledger duplicate guard to fire, got: $e")
  }

  test("indexManifest: one-row edit flips exactly the checksum; counts hold; order-invariant; empty = (0,0)") {
    val s = spark
    import s.implicits._
    val t = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Layout.indexManifest(Seq(("t", df,
          concat_ws("|", col("id"), col("v")))))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .head
    val base = manifest(t)
    assert(base._2 == 3L)
    // a one-row content edit keeps the count but flips the checksum
    val edited = manifest(
      Seq((1L, 10L), (2L, 21L), (3L, 30L)).toDF("id", "v"))
    assert(edited._2 == 3L, "count must hold under a content edit")
    assert(edited._3 != base._3, "checksum must flip on a one-row edit")
    // a dropped row changes the count AND the checksum
    val dropped = manifest(Seq((1L, 10L), (3L, 30L)).toDF("id", "v"))
    assert(dropped._2 == 2L && dropped._3 != base._3)
    // row order / partitioning never matters (XOR commutes)
    val shuffled = manifest(
      Seq((3L, 30L), (1L, 10L), (2L, 20L)).toDF("id", "v")
        .repartition(7))
    assert(shuffled == base, "manifest must be order/partition-invariant")
    // an empty table manifests as (0, 0), not null
    val empty = manifest(t.filter(col("id") > 99))
    assert(empty._2 == 0L && empty._3 == 0L)
    // a NULL row key must fail loudly — md5(null) = null would count
    // in n_rows yet silently vanish from the bit_xor, the exact
    // corruption class the checksum exists to catch
    val nullable = Seq((1L, Some("a")), (2L, None))
      .toDF("id", "v")
    val e = intercept[Exception] {
      Layout.indexManifest(Seq(("t", nullable, col("v")))).collect()
    }
    assert(e.getMessage.contains("null row key"),
      s"wrong failure: ${e.getMessage}")
  }

  test("manifest ledger: merge ≡ full derivation; retract is merge's exact inverse") {
    val s = spark
    import s.implicits._
    val rows = (1L to 40L).map(i => (i, i * 7 % 13)).toDF("id", "v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Layout.indexManifest(Seq(("t", df,
        concat_ws("|", col("id"), col("v")))))
    def one(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
    val full = one(m(rows))
    // append direction: history ⊕ batch ≡ full — history never re-read
    val merged = one(Layout.manifestMerge(
      m(rows.filter(col("id") <= 25)), m(rows.filter(col("id") > 25))))
    assert(merged == full, s"merge diverged: $merged vs $full")
    // delete direction: full ⊖ deleted ≡ survivors
    val retracted = one(Layout.manifestRetract(
      m(rows), m(rows.filter(col("id") % 4 === 0))))
    val survivors = one(m(rows.filter(col("id") % 4 =!= 0)))
    assert(retracted == survivors,
      s"retract diverged: $retracted vs $survivors")
    // and retracting everything lands exactly on the empty manifest
    val zero = one(Layout.manifestRetract(m(rows), m(rows)))
    assert(zero._2 == 0L && zero._3 == 0L, s"full retract not zero: $zero")
  }

  test("snapshotDiff: all four statuses; liveness matches the serving mask") {
    val s = spark
    import s.implicits._
    // ids: 1 unchanged, 2 restated at seg 1, 3 added at seg 1,
    // 4 deleted at stamp 1, 5 dead in BOTH snapshots (absent),
    // 6 added at seg 1 but dead at stamp 1 (absent)
    val segs = Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1), (4L, 0),
        (5L, 0), (6L, 1))
      .toDF("id", "seg")
    val tombs = Seq((4L, 1), (5L, 0), (6L, 1)).toDF("id", "seg")
    val got = Layout.snapshotDiff(segs, tombs, "id", "seg", 0, 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(2)).map(_.toString.toInt),
        Option(r.get(3)).map(_.toString.toInt))).toMap
    assert(got == Map(
      1L -> ("unchanged", Some(0), Some(0)),
      2L -> ("restated", Some(0), Some(1)),
      3L -> ("added", None, Some(1)),
      4L -> ("deleted", Some(0), None)),
      s"diff wrong: $got")
    intercept[IllegalArgumentException] {
      Layout.snapshotDiff(segs, tombs, "id", "seg", 2, 1)
    }
  }

  test("compactLatestMulti: group election drops vanished rows; as-of restores the old list") {
    val s = spark
    import s.implicits._
    // doc 1's seg-0 list has tokens (a, b); its seg-1 restatement has
    // (a, c) — after compaction, b must be GONE (the row-level
    // latest-wins failure mode) and c present; doc 2 is untouched
    val segs = Seq(
        (1L, 0, "a", 0), (1L, 0, "b", 1),
        (2L, 0, "a", 0),
        (1L, 1, "a", 0), (1L, 1, "c", 1))
      .toDF("doc_id", "seg", "token", "pos")
    val latest = Layout.compactLatestMulti(segs, "doc_id", "seg",
        "token", 2)
      .select("doc_id", "token", "pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(latest == Set((1L, "a", 0), (1L, "c", 1), (2L, "a", 0)),
      s"group election wrong: $latest")
    // as-of 0 reconstructs exactly the seg-0 row-sets
    val asOf0 = Layout.compactAsOfMulti(segs, "doc_id", "seg", "token",
        2, asOf = 0)
      .select("doc_id", "token", "pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(asOf0 == Set((1L, "a", 0), (1L, "b", 1), (2L, "a", 0)),
      s"as-of snapshot wrong: $asOf0")
  }

  test("compactLatestMulti composite key: (layer, src) elects per layer, not per src") {
    val s = spark
    import s.implicits._
    // src 1 restates its bag ONLY on layer 0 — a src-only key would
    // wrongly drop its untouched layer-1 bag; the composite key keeps
    // layer 1's seg-0 rows and elects layer 0's seg-1 rows
    val segs = Seq(
        (0, 1L, 2L, 0), (0, 1L, 3L, 0),
        (1, 1L, 4L, 0),
        (0, 2L, 5L, 0),
        (0, 1L, 9L, 1))
      .toDF("layer", "src", "dst", "seg")
    val got = Layout.compactLatestMulti(segs, Seq("layer", "src"),
        "seg", "src", 2)
      .select("layer", "src", "dst")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((0, 1L, 9L), (1, 1L, 4L), (0, 2L, 5L)),
      s"composite election wrong: $got")
    // the single-key overload is the Seq-of-one special case
    val single = Layout.compactLatestMulti(segs.filter(col("layer") === 0),
        "src", "seg", "src", 2)
      .select("layer", "src", "dst")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(single == Set((0, 1L, 9L), (0, 2L, 5L)),
      s"single-key election drifted: $single")
  }

  test("text-axis as-of: phrase search over the as-of postings ≡ the original corpus") {
    val s = spark
    import s.implicits._
    import graft.operators.Search
    val docs = Seq(
        (1L, "big order big order now"),
        (2L, "no match here"),
        (3L, "big order again")).toDF("doc_id", "text")
    val restated = Seq((1L, "nothing to see")).toDF("doc_id", "text")
    val segs = Search.positionalIndex(docs, "doc_id", "text")
      .withColumn("seg", lit(0))
      .unionByName(Search.positionalIndex(restated, "doc_id", "text")
        .withColumn("seg", lit(1)))
    def phrase(idx: org.apache.spark.sql.DataFrame) =
      Search.phraseSearchIndexed(idx.select("token", "doc_id", "pos"),
          "doc_id", Seq("big", "order"), topN = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at LATEST, doc 1's restatement removed the phrase
    val latest = phrase(Layout.compactLatestMulti(segs, "doc_id", "seg",
      "token", 2))
    assert(latest == Set((3L, 1L)), s"latest serving wrong: $latest")
    // as-of 0, the original phrase occurrences are all visible
    val asOf0 = phrase(Layout.compactAsOfMulti(segs, "doc_id", "seg",
      "token", 2, asOf = 0))
    val direct = phrase(Search.positionalIndex(docs, "doc_id", "text")
      .withColumn("seg", lit(0)))
    assert(asOf0 == direct && asOf0 == Set((1L, 2L), (3L, 1L)),
      s"as-of text serving diverged: $asOf0 vs $direct")
  }
}
