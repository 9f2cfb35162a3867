package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any word
  * k-gram with an evaluation/benchmark set (the standard train-set
  * hygiene pass before an LLM training run — e.g. the 13-gram overlap
  * rule; on this tiny-vocabulary synthetic corpus the analog is k=3).
  *
  * Scale design: benchmark sets are tiny (thousands of eval documents)
  * next to a 100 TB corpus, so the benchmark's distinct shingle set is
  * BROADCAST and the corpus side never shuffles its full shingle
  * stream: explode → broadcast hash join (map-side filter) — only the
  * MATCHED (doc, shingle) pairs shuffle (distinct + per-doc count),
  * a tiny fraction of the corpus. The corpus text itself is touched
  * exactly once, map-side.
  */
object Decontam {

  /** Per-document contamination report against `benchmark`.
    * Output: (doc_id, hit_ngrams, contaminated) — the number of the
    * document's DISTINCT k-shingles that appear anywhere in the
    * benchmark set, and a boolean flag. Documents with zero overlap are
    * kept (left join), so the report covers the whole corpus.
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    // dedup = false, then distinct AFTER the broadcast filter: the
    // corpus-wide shingle distinct would shuffle every shingle of the
    // corpus; filtering first means the only shuffled rows are actual
    // benchmark matches (a tiny fraction), deduped to distinct
    // (doc, shingle) so repeats inside one doc still count once.
    val corpusSh = Dedup.explodedShingles(corpus, idCol, textCol, k,
      dedup = false)
    val benchSh = Dedup.explodedShingles(benchmark, idCol, textCol, k)
      .select(col("sh")).distinct()
    val hits = corpusSh
      .join(broadcast(benchSh), "sh")
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hit_ngrams"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hit_ngrams"), lit(0L)).as("hit_ngrams"))
      .withColumn("contaminated", col("hit_ngrams") > 0)
  }

  /** Semantic decontamination — the embedding-space sibling of
    * [[contaminationReport]]: n-gram overlap misses the PARAPHRASED
    * benchmark question sitting in the training corpus, which is
    * exactly the contamination that inflates evals hardest. Every
    * corpus vector is scored against the benchmark panel by cosine;
    * a document whose nearest benchmark item reaches `tau` is flagged.
    * Output: one row per corpus vector — (doc_id, eval_id of the
    * nearest benchmark item, cos, contaminated) — the full audit
    * ledger, not just the flagged tail, so the same pass also yields
    * the margin distribution reviewers ask for.
    *
    * Scale shape: benchmark sets are tiny next to a 100 TB corpus, so
    * the panel (with precomputed norms) is BROADCAST and the corpus
    * streams map-side — q20/q118's audited bounded-fan class, cost
    * |corpus|·|panel| dot products with zero corpus shuffle: the
    * per-doc argmax folds through a partial-combining struct-min
    * aggregate, so each task emits ONE row per corpus doc before the
    * exchange (the exchange carries |corpus| rows, no pair ever
    * crosses it). For panels too large to broadcast, swap the
    * candidate source to [[Similarity.lshCandidatesMultiProbe]] and
    * keep the same aggregate tail (the q118 discipline).
    *
    * Determinism: cosines are the [[Similarity.withNorm]] dot/norm
    * formula (left-to-right IEEE double accumulation, bit-identical
    * across engines), and the argmax tie-breaks on the smaller
    * eval_id via the struct ordering, so the report hash-matches the
    * SQL twin exactly. */
  def semanticContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val base = Similarity.withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("doc_id"), col(vecCol).as("__dv"),
        col("nrm").as("__dn"))
    val panel = Similarity.withNorm(benchmark, idCol, vecCol)
      .select(col(idCol).as("eval_id"), col(vecCol).as("__ev"),
        col("nrm").as("__en"))
    base.crossJoin(broadcast(panel))
      .withColumn("__cos",
        dot(col("__dv"), col("__ev")) / (col("__dn") * col("__en")))
      // argmax(cos) with min-eval_id tie-break as a struct MIN: the
      // negation is an exact IEEE sign flip, so ordering on -cos is
      // ordering on cos reversed, and the partial aggregate collapses
      // each doc's panel fan to one row map-side
      .groupBy(col("doc_id"))
      .agg(min(struct(negate(col("__cos")).as("nc"),
        col("eval_id").as("eid"))).as("__m"))
      .select(col("doc_id"), col("__m.eid").as("eval_id"),
        negate(col("__m.nc")).as("cos"))
      .withColumn("contaminated", col("cos") >= tau)
  }

  /** [[semanticContamination]] at panel scales where even a broadcast
    * corpus × panel fan is too wide: candidates come from multi-probe
    * LSH buckets ([[Similarity.lshCandidatesMultiProbe]] over the
    * corpus ∪ panel bucket table — caller guarantees disjoint ids),
    * then the SAME exact-cosine argmax tail. Flag precision is 1.0 by
    * construction (a candidate's exact cos ≥ τ implies the true max
    * is too); recall is the q21/q22 probe tradeoff, spec-pinned. Docs
    * with no bucket-mate in the panel surface with null cos and
    * contaminated = false via the left join — the report still covers
    * the whole corpus. The exact form stays the registered gate
    * query. */
  def semanticContaminationLsh(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, tau: Double,
      numTables: Int = 6, planesPerTable: Int = 6,
      dims: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val union = corpus.select(col(idCol), col(vecCol))
      .unionByName(benchmark.select(col(idCol), col(vecCol)))
    val buckets = Similarity.lshBuckets(union, idCol, vecCol,
      numTables, planesPerTable, dims)
    val qids = benchmark.select(col(idCol).as("qid")).distinct()
    val cands = Similarity.lshCandidatesMultiProbe(buckets, qids,
      planesPerTable)
    val cn = Similarity.withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("n_id"), col(vecCol).as("__dv"),
        col("nrm").as("__dn"))
    val en = Similarity.withNorm(benchmark, idCol, vecCol)
      .select(col(idCol).as("q_id"), col(vecCol).as("__ev"),
        col("nrm").as("__en"))
    val best = cands
      .join(cn, Seq("n_id")) // restricts neighbors to the corpus side
      .join(broadcast(en), Seq("q_id"))
      .withColumn("__cos",
        dot(col("__dv"), col("__ev")) / (col("__dn") * col("__en")))
      .groupBy(col("n_id"))
      .agg(min(struct(negate(col("__cos")).as("nc"),
        col("q_id").as("eid"))).as("__m"))
      .select(col("n_id").as("doc_id"), col("__m.eid").as("eval_id"),
        negate(col("__m.nc")).as("cos"))
    corpus.select(col(idCol).as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .withColumn("contaminated",
        coalesce(col("cos") >= tau, lit(false)))
  }

  /** Cross-source n-gram overlap matrix — the mixture diagnostic that
    * tells you which corpus components copy each other (web-crawl
    * snapshots sharing pages, a curated set scraped from a crawl
    * already in the mixture): per unordered source pair, how many
    * DISTINCT word k-shingles appear in both. Upstream of mixture
    * weighting, an overlapping pair means the effective epochs on the
    * shared text multiply.
    *
    * Scale shape: built WITHOUT a shingle self-join (corpus-wide
    * shingle joins explode quadratically on shared vocabulary — the
    * q19 lesson): distinct (source, shingle) rows exchange ONCE keyed
    * by shingle, each shingle group folds in-row to its source set
    * (bounded by |sources|, which is small by definition — mixture
    * components number in the dozens), and the s² pair expansion
    * happens IN-ROW on that bounded set before the final ≤|S|²-row
    * aggregate. Nothing quadratic ever hits an exchange. Output:
    * (src_a, src_b, shared_shingles), src_a < src_b. */
  def sourceOverlapMatrix(docs: DataFrame, srcCol: String,
      textCol: String, k: Int): DataFrame = {
    // shingle keyed by SOURCE, not doc id: explodedShingles' distinct
    // then lands directly on (source, shingle) — no doc_id join, and
    // the map-side partial distinct collapses each source's repeated
    // shingles before the one exchange
    Dedup.explodedShingles(docs, srcCol, textCol, k)
      .select(col("doc_id").as("__src"), col("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("__src"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_shingles"))
  }

  /** SPAN-CAPABLE benchmark decontamination over the WINNOWED index:
    * corpus docs sharing at least `minShared` selected fingerprints
    * with a benchmark doc, pair-attributed — the scale form of
    * [[contaminationReport]] for long-quote contamination. Winnowing
    * ([[Dedup.winnowFingerprints]]) shrinks both posting lists
    * ~windowW/2× while guaranteeing any quoted run of at least
    * windowW+k-1 words still collides, so the miss class is bounded
    * and named, unlike sampling. The benchmark side is eval-suite
    * sized and BROADCASTS — the corpus side never shuffles at all:
    * fingerprints compute map-side and probe the broadcast, and the
    * only exchange carries surviving (doc, bench) pairs. Output:
    * (doc_id, bench_id, n_shared). */
  def winnowedContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int, windowW: Int,
      minShared: Int): DataFrame = {
    val bfps = Dedup.winnowFingerprints(benchmark, idCol, textCol,
        k, windowW)
      .select(col("doc_id").as("bench_id"), col("fp")).distinct()
    val cfps = Dedup.winnowFingerprints(corpus, idCol, textCol,
        k, windowW)
      .select(col("doc_id"), col("fp")).distinct()
    cfps.join(broadcast(bfps), "fp")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** REGION-attributed form of [[winnowedContamination]] — what an
    * eval-suite audit actually publishes: not just "doc X touches
    * benchmark Y" but WHERE the quoted material sits (start, length)
    * in both documents, so the contaminated regions can be excised or
    * the doc adjudicated. Composition of the winnowed match join with
    * the [[Dedup.sharedSpans]] gaps-and-islands + stitching tail:
    * matched (corpus-pos, bench-pos) fingerprint pairs on the same
    * pair DIAGONAL merge into one region when their word gap is ≤
    * `maxGap`. Winnowed selections are SPARSE (expected density
    * 2/(windowW+1)), so unlike the full-index q153 path the matches
    * inside one quoted run are not consecutive — but the winnowing
    * guarantee puts a shared selected fingerprint in every fully
    * interior window, so consecutive interior matches sit ≤ windowW
    * positions apart and `maxGap ≈ windowW + k` stitches a quote into
    * one region. Reported extent is CERTIFIED (first to last matched
    * fingerprint + k − 1 words); the true quote can extend up to
    * windowW + k − 2 words past each edge — the named edge-slack of
    * the winnowed index, traded for its ~windowW/2× size.
    *
    * Scale shape: identical to [[winnowedContamination]] — the
    * benchmark side is eval-suite sized and broadcasts (positions and
    * all); the corpus side computes fingerprints map-side and never
    * shuffles before the match join; the islands/stitch windows key by
    * (doc, bench, diagonal) — match-grained, never single-partition.
    * Pairs must still clear `minShared` distinct shared fingerprints
    * (the [[winnowedContamination]] gate, so this is a strict
    * refinement: same pairs, plus their regions). Output: (doc_id,
    * bench_id, start_doc, start_bench, span_words, n_islands). */
  def winnowedContaminationSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int, windowW: Int,
      minShared: Int, maxGap: Int, minSpan: Int): DataFrame = {
    val bfps = Dedup.winnowFingerprints(benchmark, idCol, textCol,
        k, windowW)
      .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"), col("fp"))
    val matched = Dedup.winnowFingerprints(corpus, idCol, textCol,
        k, windowW)
      .join(broadcast(bfps), "fp")
      .select(col("doc_id").as("doc_a"), col("doc_b"),
        col("pos").as("pos_a"), col("pos_b"), col("fp"))
      .transform(graft.util.CacheScope.persist)
    val pairs = matched.select(col("doc_a"), col("doc_b"), col("fp"))
      .distinct()
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minShared)
      .select(col("doc_a"), col("doc_b"))
    Dedup.stitchIslands(
        Dedup.islandsFromMatches(
          matched.join(broadcast(pairs), Seq("doc_a", "doc_b"),
            "left_semi")
            .select(col("doc_a"), col("doc_b"), col("pos_a"),
              col("pos_b")),
          k),
        minSpan, maxGap)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("bench_id"),
        col("start_a").as("start_doc"), col("start_b").as("start_bench"),
        col("span_words"), col("n_islands"))
  }

  /** APPLY form of [[winnowedContaminationSpans]] — excise the quoted
    * benchmark regions from the corpus text instead of only reporting
    * them: every flagged (start_doc, span_words) region cuts from its
    * corpus document in one in-row pass, and every corpus doc emits
    * (doc_id, kept_text, n_removed) whether or not it was touched —
    * the decontamination pass a training-data pipeline actually
    * schedules before export (dropping whole docs wastes the clean
    * remainder; quoting-heavy docs lose only the quotes).
    *
    * Inherits the certified-extent contract: the cut covers first to
    * last matched fingerprint + k − 1 words, and up to windowW + k − 2
    * words of true quote can survive past each edge (the named
    * winnowed-index slack — callers wanting belt-and-braces widen
    * spans before cutting). Removal positions fold to one array per
    * doc and join the text under the [[Dedup.cutPositions]]
    * `removalJoin` size-gate ("auto" default: AQE broadcasts an
    * eval-suite-sized removal set, shuffles a corpus-proportional
    * one); the span analysis itself never shuffles the corpus
    * (benchmark side broadcasts — [[winnowedContaminationSpans]]). */
  def redactContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int, windowW: Int,
      minShared: Int, maxGap: Int, minSpan: Int,
      removalJoin: String = "auto"): DataFrame = {
    val removal = winnowedContaminationSpans(corpus, benchmark, idCol,
        textCol, k, windowW, minShared, maxGap, minSpan)
      .select(col("doc_id"),
        explode(sequence(col("start_doc"),
          col("start_doc") + col("span_words") - 1)).as("rmpos"))
      // overlapping quotes cover a position twice — collect_set is
      // the dedup (a pre-aggregate .distinct() would add a second
      // corpus-keyed exchange for nothing)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("rmpos")).as("__rm"))
    Dedup.cutPositions(corpus, idCol, textCol, removal, removalJoin)
  }

  /** Per-document n-gram NOVELTY against a stored history — the
    * "what does this batch actually add" metric a pipeline reads
    * before paying to train on new data (and the memorization-risk
    * complement: a doc whose shingles are all already in history adds
    * nothing but repetition). For each batch doc: distinct word
    * k-shingles, how many appear NOWHERE in history, and the novelty
    * share in integer micro-units (floor — engine-portable).
    *
    * Scale shape (the q156/q179 stored-side discipline): the batch's
    * distinct shingle set is batch-bounded and BROADCASTS into a
    * semi-join on the stored history shingle column — only history
    * rows colliding with a batch shingle (a batch-proportional slice)
    * survive to the membership anti-join; history is never shuffled
    * whole and never rescanned beyond that one semi-filtered column
    * scan. Corpora where even the batch shingle set outgrows a
    * broadcast take the Bloom road ([[graft.operators.Dedup]]'s
    * bloomKnownFlag as a prefilter, exact verify on maybe-known
    * survivors). `history` is the stored distinct-shingle column
    * (one `sh` STRING column — [[Dedup.explodedShingles]]' shape
    * projected); history and batch doc ids must be disjoint. Output:
    * one row per BATCH doc — (doc_id, n_shingles, n_novel,
    * novelty_micro); a doc too short to produce a k-shingle reports
    * (0, 0, 0) rather than vanishing, so a caller auditing a batch
    * roster sees every doc it submitted (the roster left-join is
    * batch-proportional). */
  def ngramNovelty(history: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val bsh = Dedup.explodedShingles(batch, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    // semi-filter FIRST (broadcast probe, no exchange), THEN distinct
    // the batch-proportional survivors — distincting history up front
    // would shuffle the whole stored table
    val known = history.select(col("sh"))
      .join(broadcast(bsh.select(col("sh")).distinct()), Seq("sh"),
        "left_semi")
      .distinct()
    val perDoc = bsh
      .join(broadcast(known.withColumn("__known", lit(1))),
        Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_micro",
        expr("n_novel * 1000000L DIV n_shingles"))
    batch.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("novelty_micro"), lit(0L)).as("novelty_micro"))
  }

  /** O(new) maintenance for [[ngramNovelty]]'s stored history — the
    * shingle LEDGER absorbs a day's batch by appending only the
    * shingles it does not already hold. The fresh set is computed
    * BATCH-side (an anti-join driven from the stored side would
    * shuffle the whole ledger): the batch's distinct shingles
    * semi-filter the ledger scan to the known slice, both
    * broadcast-bounded, and batch-minus-known unions onto the ledger
    * scan unchanged. The merged ledger is exactly
    * distinct(history ∪ batch) — set union of distinct sets — so
    * tomorrow's [[ngramNovelty]] against it equals the full-history
    * recompute (the q65/q147 sufficient-statistics discipline; the
    * gate oracle IS that recompute). History rows are read once and
    * never exchanged. */
  def ngramLedgerMerge(ledger: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val bsh = Dedup.explodedShingles(batch, idCol, textCol, k)
      .select(col("sh")).distinct()
      .transform(graft.util.CacheScope.persist)
    val known = ledger.select(col("sh"))
      .join(broadcast(bsh), Seq("sh"), "left_semi")
      .distinct()
    val fresh = bsh.join(broadcast(known), Seq("sh"), "left_anti")
    ledger.select(col("sh")).unionByName(fresh)
  }

  /** Per-source n-gram UNIQUENESS: of each source's distinct word
    * k-shingles, how many appear in NO other source — the
    * "does this slice add anything the mixture doesn't already have"
    * signal, the per-source complement of [[sourceOverlapMatrix]]'s
    * pairwise view. `exclusive_micro` is the exclusivity share in
    * integer micro-units (floor; numerator and denominator are
    * non-negative, so Spark DIV and the oracle's // agree).
    *
    * Scale shape: the exchange carries DISTINCT (source, shingle)
    * pairs once (map-side partial distinct collapses per-source
    * repeats first — [[sourceOverlapMatrix]]'s class); the ownership
    * census then folds to |distinct shingles| keys and fans back by
    * an equi-join. Corpora where the distinct-shingle exchange is the
    * bottleneck take the q139 KMV-sketch road instead — this is the
    * exact form. */
  def sourceUniqueness(docs: DataFrame, srcCol: String, textCol: String,
      k: Int): DataFrame = {
    val fps = Dedup.explodedShingles(docs, srcCol, textCol, k)
      .select(col("doc_id").as("__src"), col("sh"))
      .transform(graft.util.CacheScope.persist)
    val owners = fps.groupBy(col("sh"))
      .agg(count(lit(1)).as("n_sources"))
    fps.join(owners, "sh")
      .groupBy(col("__src").as(srcCol))
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L))
          .as("n_exclusive"))
      .withColumn("exclusive_micro",
        expr("n_exclusive * 1000000L DIV n_fps"))
  }
}
