package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale: Z-order (Morton)
  * clustering interleaves the bits of two keys so that range-partitioned,
  * internally-sorted files are simultaneously clustered on BOTH
  * dimensions — parquet min/max stats then prune files for predicates on
  * either key, where single-key sorting prunes only its own. The
  * standard lakehouse trick for the "filter by customer AND by date"
  * workload on a 100 TB fact table.
  *
  * The z-value is pure bit arithmetic over codegen'd built-ins (16
  * shift/mask terms per dimension — no UDF), identical in any engine.
  */
object Layout {

  /** Bits per dimension; two 16-bit dims pack into a 32-bit z-value. */
  val ZBits = 16

  /** Morton interleave of the low [[ZBits]] bits of x (even positions)
    * and y (odd positions). Inputs are masked, so callers quantize to
    * 16-bit range themselves (e.g. `pmod(key, 65536)` or a bucketed
    * day number). */
  def zValue(x: Column, y: Column): Column = {
    val xm = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ym = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until ZBits).map { j =>
      val xbit = shiftright(xm, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))
      val ybit = shiftright(ym, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
      xbit + ybit
    }.reduce(_ + _)
  }

  /** The identical arithmetic as ANSI SQL, for oracle twins:
    * Σ_j ((x>>j)&1)·2^{2j} + ((y>>j)&1)·2^{2j+1} over masked inputs. */
  def zValueSql(x: String, y: String): String = {
    val terms = (0 until ZBits).flatMap { j =>
      Seq(s"((($x & 65535) >> $j) & 1) * ${1L << (2 * j)}",
        s"((($y & 65535) >> $j) & 1) * ${1L << (2 * j + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Write `df` clustered by the z-value of (xCol, yCol):
    * repartitionByRange on the z-value (range partitioner = contiguous
    * z-runs per file) + sortWithinPartitions (tight per-file min/max on
    * both source keys). Files get bounded spans in BOTH dimensions. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, path: String): Unit = {
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** SEGMENT COMPACTION — the maintenance pass every append-mostly
    * stored table needs once restatement segments pile up (the q231
    * upsert family WRITES new segments precisely so the daily path
    * stays O(new); this is the amortized rewrite that keeps reads
    * from degrading): elect the LATEST segment's row per id (max
    * `segCol` wins — later segments restate earlier ones), then
    * rewrite the survivors clustered by `clusterCol` and sorted
    * (`clusterCol`, `idCol`) within partitions, so the compacted
    * table serves cell-local scans (IVF probes, cid-keyed joins) from
    * contiguous, min/max-prunable runs again.
    *
    * One corpus exchange for the election (id-keyed window) and one
    * for the rewrite (the clustering IS the product — same count as
    * any compactor) — no join, no corpus broadcast, segment count
    * never matters beyond its row count. The same window that elects
    * also GUARDS the WHOLE ledger: a duplicate (id, seg) pair is a
    * corrupt ledger (two restatements of one id in one segment —
    * latest-wins is undefined), and since duplicates are ADJACENT in
    * the seg-descending sort, a per-row `lead` probe folded through a
    * full-frame max over the same id partition (same partitioning +
    * ordering — one Window exec, zero extra exchanges) detects a
    * duplicate at ANY segment, not just the electing one, and raises
    * loudly instead of letting an arbitrary row win. The raise fires
    * LAZILY — at whatever action first touches the corrupt id's row —
    * so inside a long serving chain it surfaces as a mid-job task
    * failure with this message, not a plan-time fail-fast; a wrapper
    * that must fail before launching work should force a cheap action
    * (e.g. `.limit(1).count()`) on the compacted frame first.
    * Contract: `segCol` is unique per id; all original columns pass
    * through. */
  /** TIME-TRAVEL form of [[compactLatest]]: reconstruct the table AS
    * OF segment `asOf` — the latest row per id among segments ≤ asOf,
    * later restatements invisible. This is what makes a stored index
    * REPRODUCIBLE: a training run pinned to day N re-reads exactly
    * the index day N served, whatever landed since (the lakehouse
    * snapshot-read semantic, expressed over the same restatement
    * segments the upsert family writes). The cutoff is a plain
    * predicate on the segment column — at rest it prunes whole
    * segment files before any election work. */
  def compactAsOf(segments: DataFrame, idCol: String, segCol: String,
      clusterCol: String, numPartitions: Int, asOf: Int): DataFrame =
    compactLatest(segments.filter(col(segCol) <= asOf), idCol, segCol,
      clusterCol, numPartitions)

  /** INTEGRITY MANIFEST over a set of STORED INDEX tables — the q141
    * shard-manifest discipline (row count + an order-invariant
    * content checksum) applied to the ANN/search pillar, the
    * verify-before-serve step that turns a dropped part-file in the
    * codes table from silently wrong neighbors into a loud mismatch:
    * derive the manifest at index BUILD time, persist it next to the
    * tables, re-derive before serving (or before burning
    * cluster-hours on a training run against the index) and compare.
    *
    * Each entry is (name, table, rowKey) where `rowKey` is a STRING
    * rendering of the row's content (the caller picks the columns —
    * and therefore what "content" means — because only it knows the
    * table's schema); the checksum is the bit-XOR of 60-bit md5
    * fingerprints of that rendering. XOR commutes, so the value is
    * partition/order/merge-invariant — exactly what a distributed
    * re-derivation needs; fingerprints compute map-side and each
    * table contributes ONE partial-combining aggregate, so the
    * manifest costs one scan per table and exchanges k·1 rows. An
    * empty table manifests as (0, 0), not a null. Output:
    * (table_name, n_rows, checksum), one row per entry. */
  def indexManifest(tables: Seq[(String, DataFrame, Column)]): DataFrame = {
    require(tables.nonEmpty, "indexManifest needs at least one table")
    require(tables.map(_._1).distinct.size == tables.size,
      "indexManifest table names must be distinct")
    tables.map { case (name, df, rowKey) =>
      // a null rowKey would md5 to null and silently VANISH from the
      // bit_xor while still counting in n_rows — corruption that nulls
      // a key column must fail loudly, not dodge the checksum
      df.select(when(rowKey.isNull, raise_error(lit(
            s"indexManifest($name): null row key — a manifested row " +
              "must render every content column non-null")))
          .otherwise(conv(substring(md5(rowKey), 1, 15), 16, 10)
            .cast("long")).as("__fp60"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(expr("bit_xor(__fp60)"), lit(0L)).as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("checksum"))
    }.reduce(_.unionByName(_))
  }

  /** O(new) MAINTENANCE of an [[indexManifest]] — the manifest is a
    * LEDGER, not a snapshot-only artifact: n_rows adds and the XOR
    * checksum is its own inverse (a group), so an append-only table's
    * manifest merges from the batch's manifest alone and a delete
    * RETRACTS by merging the deleted rows' manifest with negated
    * count — history is never re-fingerprinted (the
    * [[graft.operators.Ledger]] discipline on the integrity axis).
    * Inputs/output are (table_name, n_rows, checksum) frames; tables
    * absent from one side pass through. */
  def manifestMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("table_name"), col("n_rows"), col("checksum"))
      .unionByName(
        b.select(col("table_name"), col("n_rows"), col("checksum")))
      .groupBy(col("table_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        expr("bit_xor(checksum)").as("checksum"))

  /** [[manifestMerge]]'s delete direction: XOR is self-inverse, so
    * retracting = merging the DELETED rows' manifest with its row
    * count negated. `full` minus `deleted` must be a true superset
    * relationship — the caller's contract, exactly [[graft.operators
    * .Ledger.retract]]'s. */
  def manifestRetract(full: DataFrame, deleted: DataFrame): DataFrame =
    manifestMerge(full,
      deleted.select(col("table_name"),
        (-col("n_rows")).as("n_rows"), col("checksum")))

  /** SNAPSHOT DIFF — the provenance report between two as-of reads of
    * a segmented, tombstoned stored table ("what changed between the
    * index my last run trained on and today's"): per id, `added`
    * (live at new, absent/dead at old), `deleted` (the reverse),
    * `restated` (live in both, a newer segment elected), or
    * `unchanged`; ids live in neither snapshot are omitted. Liveness
    * matches the serving semantic exactly ([[compactAsOf]] election +
    * the as-of tombstone mask of the q255 stack), so the diff IS the
    * difference between the two serveable states.
    *
    * Scale shape: ONE corpus aggregation computes both elections (max
    * segment ≤ old and ≤ new ride the same groupBy — no second pass,
    * no join between snapshots), and the tombstone stamps join as
    * deleted-proportional broadcasts. Output: (idCol, status,
    * seg_old, seg_new) — segs null on the absent side. */
  def snapshotDiff(segments: DataFrame, tombstones: DataFrame,
      idCol: String, segCol: String, asOfOld: Int,
      asOfNew: Int): DataFrame = {
    require(asOfNew >= asOfOld,
      s"snapshotDiff: asOfNew=$asOfNew must be >= asOfOld=$asOfOld")
    val elected = segments.filter(col(segCol) <= asOfNew)
      .groupBy(col(idCol))
      .agg(max(when(col(segCol) <= asOfOld, col(segCol))).as("seg_old"),
        max(col(segCol)).as("seg_new"))
    val deadOld = tombstones.filter(col(segCol) <= asOfOld)
      .select(col(idCol)).distinct().withColumn("__dead_old", lit(true))
    val deadNew = tombstones.filter(col(segCol) <= asOfNew)
      .select(col(idCol)).distinct().withColumn("__dead_new", lit(true))
    elected
      .join(broadcast(deadOld), Seq(idCol), "left")
      .join(broadcast(deadNew), Seq(idCol), "left")
      .withColumn("__lo",
        col("seg_old").isNotNull && !coalesce(col("__dead_old"), lit(false)))
      .withColumn("__ln",
        col("seg_new").isNotNull && !coalesce(col("__dead_new"), lit(false)))
      .withColumn("status",
        when(col("__lo") && !col("__ln"), lit("deleted"))
          .when(!col("__lo") && col("__ln"), lit("added"))
          .when(col("__lo") && col("__ln") &&
            col("seg_new") > col("seg_old"), lit("restated"))
          .when(col("__lo") && col("__ln"), lit("unchanged")))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"),
        when(col("__lo"), col("seg_old")).as("seg_old"),
        when(col("__ln"), col("seg_new")).as("seg_new"))
  }

  /** [[compactLatest]] for MULTI-ROW-per-id segment tables — the
    * posting-list case: a restated document re-tokenizes ONLY itself
    * and writes ALL its (token, doc, pos) rows as one new segment
    * (the daily path stays O(new)), so election is per GROUP, not per
    * row — the latest segment's whole row-set per id wins, earlier
    * segments' rows for that id vanish (including tokens the new
    * version no longer contains, which a row-level latest-wins could
    * never remove). Survivors rewrite clustered by `clusterCol`
    * (token, for the postings table) so term scans read contiguous,
    * min/max-prunable runs.
    *
    * Same cost shape as [[compactLatest]]: one id-keyed window
    * exchange for the election (max segment per id fans back over the
    * same partitioning — no join), one exchange for the clustered
    * rewrite that IS the product. No duplicate guard here — multiple
    * rows per (id, seg) are the table's normal shape. Contract: a
    * segment restates an id COMPLETELY (all rows of the id's list). */
  def compactLatestMulti(segments: DataFrame, idCol: String,
      segCol: String, clusterCol: String,
      numPartitions: Int): DataFrame =
    compactLatestMulti(segments, Seq(idCol), segCol, clusterCol,
      numPartitions)

  /** COMPOSITE-KEY form of [[compactLatestMulti]] — the election key
    * is a column TUPLE (e.g. (layer, src) for the layered kNN graph,
    * where a maintenance segment restates a source's bag PER LAYER and
    * the same src may carry different bags on different layers). Same
    * operator, same cost shape — the window just partitions by every
    * key column. */
  def compactLatestMulti(segments: DataFrame, idCols: Seq[String],
      segCol: String, clusterCol: String,
      numPartitions: Int): DataFrame = {
    require(idCols.nonEmpty, "compactLatestMulti needs a key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCols.map(col): _*)
    segments
      .withColumn("__winner", max(col(segCol)).over(w))
      .filter(col(segCol) === col("__winner"))
      .drop("__winner")
      .repartition(numPartitions, col(clusterCol))
      .sortWithinPartitions((clusterCol +: idCols).distinct.map(col): _*)
  }

  /** TIME-TRAVEL form of [[compactLatestMulti]] — [[compactAsOf]]'s
    * snapshot semantic on the multi-row (postings) axis: the latest
    * row-set per id among segments ≤ asOf; the cutoff is a plain
    * segment predicate, pruning whole segment files at rest. */
  def compactAsOfMulti(segments: DataFrame, idCol: String,
      segCol: String, clusterCol: String, numPartitions: Int,
      asOf: Int): DataFrame =
    compactLatestMulti(segments.filter(col(segCol) <= asOf), idCol,
      segCol, clusterCol, numPartitions)

  def compactLatest(segments: DataFrame, idCol: String, segCol: String,
      clusterCol: String, numPartitions: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(segCol).desc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(segCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    segments
      .withColumn("__rn", row_number().over(w))
      // any duplicate (id, seg) pair is adjacent under this sort; max
      // over the full frame surfaces it on the elected row
      .withColumn("__dupseg",
        max(when(lead(col(segCol), 1).over(w) === col(segCol),
          col(segCol))).over(wAll))
      .filter(col("__rn") === 1)
      .filter(when(col("__dupseg").isNotNull,
        raise_error(concat(
          lit(s"compactLatest: duplicate ($idCol, $segCol) for id "),
          col(idCol).cast("string"),
          lit(s" at $segCol "), col("__dupseg").cast("string"))))
        .otherwise(lit(true)))
      .drop("__rn", "__dupseg")
      .repartition(numPartitions, col(clusterCol))
      .sortWithinPartitions(col(clusterCol), col(idCol))
  }
}
