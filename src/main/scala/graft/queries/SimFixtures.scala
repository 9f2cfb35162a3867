package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-JVM PARQUET STORE for the similarity gate's shared derived
  * fixtures — the layered kNN graph and the flat-index/coarse tables
  * its whole query family serves from.
  *
  * WHY: a deployment builds these tables ONCE and serves every
  * downstream verb from parquet; the gate queries each rebuilt them
  * in-plan, so the layered family's fixtures dominated the bench
  * (q283 alone rebuilt the 3-layer graph plus two full flat indexes —
  * 16.9 s, 6.4% of the whole suite, round-14 verdict). The store
  * makes the gate match the deployment shape: the FIRST query that
  * needs a table builds it with the real operator and writes it under
  * java.io.tmpdir; every later query reads the parquet. The stored
  * serve ≡ in-plan serve equivalence is spec-pinned (PqSpec stored
  * lanes), and each query's ORACLE stays the full from-scratch
  * rebuild, so the correctness gate still checks the operator
  * end-to-end every run.
  *
  * Scope: the store lives for ONE JVM (a fresh UUID root per run) —
  * nothing persists across gate runs, so a stale fixture can never
  * outlive the code that built it. Keyed by scale-factor dir, so spec
  * fixtures and sf-runs never collide. Builds are serialized
  * (`synchronized`) — Verify/Bench run queries sequentially anyway.
  */
private[queries] object SimFixtures {

  private lazy val root: java.io.File = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-fixtures-${java.util.UUID.randomUUID().toString.take(8)}")
    d.mkdirs()
    d
  }

  private val built = scala.collection.mutable.Set.empty[String]

  private def sanitize(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Build-once-read-many: `build` runs (with the real operator) the
    * first time this (dir, name) is asked for in this JVM; every call
    * returns the parquet-backed frame. */
  def stored(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = synchronized {
    val key = s"${sanitize(dir)}/$name"
    val path = new java.io.File(root, key).toString
    if (!built.contains(key)) {
      build.write.mode("overwrite").parquet(path)
      built += key
    }
    spark.read.parquet(path)
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** The %3-split history corpus the incremental (append) gates use. */
  private def hist(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") % 3 > 0)

  /** The one shared coarse codebook (8 cells, 2 Lloyd iterations) the
    * layered family trains once and stores. */
  def coarse(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "coarse_8x2") {
      graft.operators.Ivf.centroids(emb(s, dir), "vec_id", "embedding",
        8, 2)
    }

  /** Stored (vec_id, cid, qvec) flat-index rows under [[coarse]]. */
  def flatIndex(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "flat_index_8x2") {
      graft.operators.Ivf.flatIndex(coarse(s, dir), emb(s, dir),
        "vec_id", "embedding", Nil)
    }

  /** The stored LAYERED kNN graph (k = 5, maxLayer = 2) under
    * [[coarse]] — the table the whole q277–q291 family serves from. */
  def layeredSeed(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "layered_seed_k5_l2") {
      graft.operators.Similarity.layeredKnnGraphWith(coarse(s, dir),
        emb(s, dir), "vec_id", "embedding", k = 5, maxLayer = 2)
    }

  /** The stored FLAT kNN graph = the layered table's layer-0 slice
    * (the promotion rule: every id ≡ 0 mod 2⁰) — one stored table
    * serves both graph families; the slice is a pushed parquet filter
    * on the scan, and the slice ≡ knnGraphSeed identity is definitional
    * (layer 0 seeds over the unfiltered corpus). */
  def flatGraph(s: SparkSession, dir: String): DataFrame =
    layeredSeed(s, dir).filter(col("layer") === 0)
      .select(col("src"), col("dst"), col("d2"), col("rnk"))

  /** The stored PRUNED flat graph (k = 5, α = 1/1 — the classic RNG
    * rule over [[flatGraph]]) — the navigable serve table the q309
    * incremental maintenance keeps current. */
  def prunedFlat(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pruned_flat_k5_a1") {
      graft.operators.Similarity.pruneGraphRng(flatGraph(s, dir),
        emb(s, dir), "vec_id", "embedding", k = 5)
    }

  /** The stored PRUNED LAYERED graph (k = 5, α = 1/1 per layer — the
    * q310 build) — the table the q311 per-layer maintenance keeps
    * current. */
  def prunedLayered(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pruned_layered_k5_a1") {
      graft.operators.Similarity.pruneLayeredGraphRng(
        layeredSeed(s, dir), emb(s, dir), "vec_id", "embedding",
        k = 5, maxLayer = 2)
    }

  /** The stored α-INDEPENDENT prune-tuning caches (k = 5) — the
    * expensive half of every recall-per-α sweep (two corpus-vector
    * joins + the group shuffle), built once next to the graphs the
    * way a deployment tuning a prune level would, and folded from
    * parquet by every sweep point (`Similarity.pruneFoldCache`
    * scaladoc). */
  def foldCacheFlat(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "prune_fold_cache_flat_k5") {
      graft.operators.Similarity.pruneFoldCache(flatGraph(s, dir),
        emb(s, dir), "vec_id", "embedding", k = 5)
    }

  def foldCacheLayered(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "prune_fold_cache_layered_k5") {
      graft.operators.Similarity.pruneLayeredFoldCache(
        layeredSeed(s, dir), emb(s, dir), "vec_id", "embedding",
        k = 5, maxLayer = 2)
    }

  /** The stored MIXED per-layer α pruned table — the q323 COMMIT
    * promoted to a serving artifact (aggressive 3/2-cover base,
    * classic RNG middle, conservative 2/3 top scaffold — the levels
    * the q315/q320 tuning curves picked): the table the mixed-α serve
    * and audit gates (q326/q327) walk, proving the committed artifact
    * actually serves, not just builds. */
  def prunedLayeredMixed(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pruned_layered_k5_mixed") {
      graft.operators.Similarity.pruneLayeredGraphRngPerLayer(
        layeredSeed(s, dir), emb(s, dir), "vec_id", "embedding",
        k = 5, alphas = Seq((2L, 3L), (1L, 1L), (3L, 2L)))
    }

  // ---- FINE-geometry (64-cell) fixture family — the pruned-graph
  // UPSERT gates' tables. At the suite's 8-cell geometry any
  // non-trivial batch touches EVERY cell, so the upserts' conservative
  // changed-source superset degenerates to the whole corpus and the
  // gates paid full re-prunes (q311 was the suite's heaviest query,
  // r15 verdict). 64 cells with a small batch makes the superset a
  // REAL subset, so the O(changed) bound the verbs claim actually
  // shows in the bench. The serve/audit family stays on the 8-cell
  // tables; only the upsert gates read these. ----

  def coarseF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "coarse_64x2") {
      graft.operators.Ivf.centroids(emb(s, dir), "vec_id", "embedding",
        64, 2)
    }

  def flatIndexF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "flat_index_64x2") {
      graft.operators.Ivf.flatIndex(coarseF(s, dir), emb(s, dir),
        "vec_id", "embedding", Nil)
    }

  def layeredSeedF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "layered_seed_k5_l2_64") {
      graft.operators.Similarity.layeredKnnGraphWith(coarseF(s, dir),
        emb(s, dir), "vec_id", "embedding", k = 5, maxLayer = 2)
    }

  def flatGraphF(s: SparkSession, dir: String): DataFrame =
    layeredSeedF(s, dir).filter(col("layer") === 0)
      .select(col("src"), col("dst"), col("d2"), col("rnk"))

  def prunedFlatF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pruned_flat_k5_a1_64") {
      graft.operators.Similarity.pruneGraphRng(flatGraphF(s, dir),
        emb(s, dir), "vec_id", "embedding", k = 5)
    }

  def prunedLayeredF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pruned_layered_k5_a1_64") {
      graft.operators.Similarity.pruneLayeredGraphRng(
        layeredSeedF(s, dir), emb(s, dir), "vec_id", "embedding",
        k = 5, maxLayer = 2)
    }

  /** Fine-geometry MIXED-α pruned layered table — the q330 mixed
    * maintenance gate's stored input (same 64-cell gate-hygiene
    * rationale as q311; same committed per-layer levels as
    * [[prunedLayeredMixed]]). */
  def prunedLayeredMixedF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pruned_layered_k5_mixed_64") {
      graft.operators.Similarity.pruneLayeredGraphRngPerLayer(
        layeredSeedF(s, dir), emb(s, dir), "vec_id", "embedding",
        k = 5, alphas = Seq((2L, 3L), (1L, 1L), (3L, 2L)))
    }

  /** Fine-geometry flat fold cache — the q324 refresh gate's stored
    * input (the upsert refresh rides the 64-cell family for the same
    * gate-hygiene reason as q309: at 8 cells the changed superset
    * degenerates to the whole corpus). */
  def foldCacheFlatF(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "prune_fold_cache_flat_k5_64") {
      graft.operators.Similarity.pruneFoldCache(flatGraphF(s, dir),
        emb(s, dir), "vec_id", "embedding", k = 5)
    }

  /** Attributed flat index (label rides the row — q235's at-source
    * discipline), the table every filtered serve verb scans. */
  def flatIndexLabeled(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "flat_index_8x2_label") {
      graft.operators.Ivf.flatIndex(coarse(s, dir), emb(s, dir),
        "vec_id", "embedding", Seq("label"))
    }

  /** The calibrated-int8 family's stored pair: the (d, p_lo, p_hi)
    * bounds ledger (10/990 permille — the generation-0 geometry every
    * full-corpus calibrated gate serves under) and the codes table
    * encoded with it. */
  def calBounds(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "cal_bounds_10_990") {
      graft.operators.Quantize.calibrationBounds(emb(s, dir), "vec_id",
        "embedding", loPermille = 10, hiPermille = 990)
    }

  def calCodes(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "cal_codes_10_990") {
      graft.operators.Quantize.calibratedCodes(emb(s, dir), "vec_id",
        "embedding", calBounds(s, dir))
    }

  /** The PQ family's stored pair (m = 4 subspaces, k = 8, 2 Lloyd
    * iterations — the suite's shared shape). */
  def pqCodebooks(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pq_codebooks_m4_k8") {
      graft.operators.Pq.codebooks(emb(s, dir), "vec_id", "embedding",
        m = 4, k = 8, iterations = 2)
    }

  def pqCodes(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pq_codes_m4") {
      graft.operators.Pq.encode(emb(s, dir), "vec_id", "embedding", 4,
        pqCodebooks(s, dir))
    }

  /** PQ codes with the label attribute IN the code row
    * ([[graft.operators.Pq.encodeIndexed]] — the q235 at-source
    * discipline on the compressed axis): the stored table the
    * filtered flat-ADC serve scans. */
  def pqCodesLabeled(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "pq_codes_m4_label") {
      graft.operators.Pq.encodeIndexed(emb(s, dir), "vec_id",
        "embedding", 4, pqCodebooks(s, dir), Seq("label"))
    }

  /** The residual (IVFADC) family's stored pair under [[coarse]]. */
  def resCodebooks(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "res_codebooks_m4_k8") {
      graft.operators.Pq.residualCodebooks(emb(s, dir), "vec_id",
        "embedding", coarse(s, dir), m = 4, numCentroids = 8,
        pqIterations = 2)
    }

  def resEncodedLabeled(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "res_encoded_m4_label") {
      graft.operators.Pq.residualEncode(emb(s, dir), "vec_id",
        "embedding", coarse(s, dir), resCodebooks(s, dir), 4,
        Seq("label"))
    }

  // ---- documents-derived stored indexes (the text pillar's
  // incremental gates keep these next to the corpus; the oracles stay
  // full-history recomputes) ----

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Positioned 5-gram shingle index over the %3 == 0 history slice —
    * the stored input q156/q183's O(new) span verbs merge against. */
  def spanIndexH(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "span_index_h3eq0_k5") {
      graft.operators.Dedup.positionedShingleFps(
        docs(s, dir).filter(col("doc_id") % 3 === 0), "doc_id", "text", 5)
    }

  /** Winnowed (k=3, w=4) fingerprint index over the %3 == 0 history
    * slice — q179's stored propose-side input. */
  def winnowIndexH(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "winnow_index_h3eq0_k3_w4") {
      graft.operators.Dedup.winnowFingerprints(
        docs(s, dir).filter(col("doc_id") % 3 === 0), "doc_id", "text",
        k = 3, windowW = 4)
    }

  /** Hot-span ledger over the %3 == 0 history slice — q183's stored
    * retract/merge input (k=5, minSpan=12, minDf=3). */
  def hotLedgerH(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "hot_ledger_h3eq0_k5") {
      graft.operators.Dedup.hotSpanLedger(
        docs(s, dir).filter(col("doc_id") % 3 === 0), "doc_id", "text",
        k = 5, minSpan = 12, minDf = 3)
    }

  /** MinHash signatures + dup-cluster ledger over the %3 > 0 history
    * slice — q144's stored pair (6 hashes, 2 rows/band, 3-shingles). */
  def minhashSigsH3(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "minhash_sigs_h3gt0") {
      graft.operators.Dedup.minhashSignaturesNative(
        docs(s, dir).filter(col("doc_id") % 3 > 0), "doc_id", "text",
        shingleK = 3, numHashes = 6)
    }

  def dupLedgerH3(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "dup_ledger_h3gt0") {
      graft.operators.Dedup.dupClusters(
        graft.operators.Dedup.minhashLsh(
          docs(s, dir).filter(col("doc_id") % 3 > 0), "doc_id", "text",
          shingleK = 3, numHashes = 6, rowsPerBand = 2))
    }

  /** History-corpus (%3 > 0) variants for the O(new) append gate. */
  def coarseH3(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "coarse_8x2_h3") {
      graft.operators.Ivf.centroids(hist(s, dir), "vec_id", "embedding",
        8, 2)
    }

  def flatIndexH3(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "flat_index_8x2_h3") {
      graft.operators.Ivf.flatIndex(coarseH3(s, dir), hist(s, dir),
        "vec_id", "embedding", Nil)
    }

  def layeredSeedH3(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "layered_seed_k5_l2_h3") {
      graft.operators.Similarity.layeredKnnGraphWith(coarseH3(s, dir),
        hist(s, dir), "vec_id", "embedding", k = 5, maxLayer = 2)
    }

  def flatGraphH3(s: SparkSession, dir: String): DataFrame =
    layeredSeedH3(s, dir).filter(col("layer") === 0)
      .select(col("src"), col("dst"), col("d2"), col("rnk"))
}
