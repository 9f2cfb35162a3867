package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines
  * (BASELINE.json north star; SURVEY.md §7.5).
  *
  * Four tiers, all shuffle-lean by construction:
  *  - exact: hash-groupBy on a normalized fingerprint. One shuffle on the
  *    16-byte digest, never on the document body.
  *  - MinHash + LSH: shingle → H independent minhashes → B banded
  *    signatures → candidates join only within equal band buckets. The
  *    O(n²) pair space never materializes; the join key is a 16-byte
  *    digest so skew is bounded by true duplicate-cluster size.
  *  - SimHash: 32-bit signature via per-bit majority vote; banded into
  *    4 × 8-bit keys for candidate generation, Hamming-verified.
  *  - n-gram Jaccard: exact verification on candidate pairs (or, small
  *    scale, on all pairs sharing a shingle).
  *
  * Everything is built from codegen'd built-ins (md5 / transform / slice /
  * aggregate) — no UDFs — and every hash is derived from md5 so a SQL
  * oracle can reproduce results bit-for-bit.
  */
object Dedup {

  /** Canonical text normalization: lowercase, collapse whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content fingerprint (rolling-hash stand-in): md5 of the normalized
    * text. Grouping on the digest keeps shuffle rows small. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace tokenization after normalization. */
  def words(text: Column): Column = split(normalize(text), " ")

  /** Word k-shingles as an array column: positions i → join of
    * words[i, i+k). Empty array when the document is shorter than k.
    * Built from k element_at reads per position, not slice+array_join —
    * the slice allocates a sub-array per shingle (measured 2× slower).
    * The words column must be a BOUND ATTRIBUTE, not an inline split():
    * non-lambda subexpressions re-evaluate per element inside
    * higher-order functions. */
  def wordShingles(wordsCol: Column, k: Int): Column =
    when(size(wordsCol) >= k,
      transform(
        sequence(lit(0), size(wordsCol) - k),
        i => concat_ws(" ",
          (1 to k).map(j => element_at(wordsCol, i + lit(j))): _*)))
      .otherwise(array())

  /** Exact dedup: group by fingerprint, keep the smallest id.
    * Output: (text_hash, keep_id, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(fingerprint(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs for a document frame. Set `dedup =
    * false` for consumers insensitive to duplicates (min-aggregation) —
    * it drops a whole shuffle. */
  def explodedShingles(docs: DataFrame, idCol: String, textCol: String,
      k: Int, dedup: Boolean = true): DataFrame = {
    // Bind the word array to an attribute BEFORE the shingle lambda:
    // non-lambda subexpressions inside a higher-order function are
    // re-evaluated per element, so an inline split() would re-tokenize
    // the document once per shingle position (measured 7s -> 0.5s on
    // 260k shingles).
    val exploded = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .select(col("doc_id"), explode(wordShingles(col("__w"), k)).as("sh"))
    if (dedup) exploded.distinct() else exploded
  }

  /** MinHash signatures: H independent hash functions, each the min over
    * the document's shingles of a 60-bit integer from md5(seed:shingle)
    * (min of a uniform hash = a valid minwise permutation; numeric min of
    * the fixed-width hex prefix ≡ its lexicographic min). NUMERIC, not
    * string, deliberately: min(string) falls back to SortAggregate
    * (immutable varlen buffer), while min(bigint) stays in the
    * HashAggregate fast path with map-side partial min — one shuffle,
    * no sorts. */
  def minhashSignatures(shingled: DataFrame, numHashes: Int): DataFrame = {
    // Kirsch-Mitzenmacher: ONE md5 per shingle, split into two 60-bit
    // halves h1,h2; hash_i = (h1 + i·h2) mod 2^60 is a valid independent
    // family — 6× fewer digest computations than md5-per-seed.
    // kh1 + i·kh2 must stay within Long (ANSI mode makes overflow a
    // runtime error; non-ANSI wrap would diverge from the oracle):
    // (1+i)·2^60 ≤ 2^63 ⇒ i ≤ 7.
    require(numHashes <= 7,
      s"numHashes=$numHashes would overflow the 60-bit KM combination; " +
        "use ≤ 7 per md5, or derive further families from seeded digests")
    val hashed = shingled.select(col("doc_id"),
      expr("CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT)").as("kh1"),
      expr("CAST(conv(substring(md5(sh), 17, 15), 16, 10) AS BIGINT)").as("kh2"))
    val aggs = (0 until numHashes).map(h =>
      min(expr(s"(kh1 + $h * kh2) % 1152921504606846976")).as(s"h$h"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: rows of (doc_id, band, sig) where sig is the digest of
    * `rowsPerBand` consecutive minhashes. Docs agreeing on any band
    * become candidates. */
  def lshBands(sigs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(h => col(s"h$h"))
      struct(lit(b).as("band"), md5(concat_ws(":", cols: _*)).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate pairs from banded signatures: equi-join on (band, sig) —
    * the only shuffle is on the band digest, so the pair space is the
    * sum of squares of bucket sizes, not n². */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    // persist: self-join attribute renames defeat ReuseExchange — the
    // shingle→minhash→band pipeline would otherwise run once per side
    val shared = bands
      .transform(graft.util.CacheScope.persist)
    val a = shared.as("a")
    val b = shared.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash signatures computed MAP-SIDE via the native
    * [[graft.functions.MinHashSig]] expression — zero shuffle (the
    * column form explodes and shuffles every shingle into a
    * groupBy-min). Docs shorter than the shingle width drop out, same
    * as the exploded form. Output schema matches
    * [[minhashSignatures]]: (doc_id, h0..h{n-1}). */
  def minhashSignaturesNative(docs: DataFrame, idCol: String,
      textCol: String, shingleK: Int, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    // The expression shingles the WORD array in-row (see MinHashSig
    // scaladoc): a Spark-side shingle array re-splits the document per
    // element wherever the optimizer inlines it — the pushed-down
    // size() filter alone made this pipeline 20× slower.
    val withSig = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= shingleK)
      .withColumn("__sig", Bridge.column(graft.functions.MinHashSig(
        Bridge.expression(col("__w")), shingleK, numHashes)))
    withSig.select(col("doc_id") +:
      (0 until numHashes).map(h =>
        element_at(col("__sig"), h + 1).as(s"h$h")): _*)
  }

  /** MinHash-LSH near-dup candidates end-to-end: map-side signatures,
    * band explode, bucket self-join — the only shuffles left are the
    * band join and the candidate distinct. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 6, rowsPerBand: Int = 2): DataFrame =
    lshCandidatePairs(lshBands(
      minhashSignaturesNative(docs, idCol, textCol, shingleK, numHashes),
      numHashes, rowsPerBand))

  /** Incremental MinHash near-dup: flag NEW documents that near-match a
    * HISTORICAL signature index — the near-dup sibling of
    * [[incrementalExact]], and the shape a daily 100 TB ingest needs.
    * The index carries (doc_id, h0..h{n-1}) ONLY — constant bytes per
    * document, no text — and is never rescanned: per batch the cost is
    * signature computation over the NEW docs (map-side native), one
    * band join new×history, and a signature-component verify
    * (`n_match`/numHashes is the standard unbiased Jaccard estimator),
    * all without touching a byte of historical text.
    *
    * `historySigs` must have the [[minhashSignaturesNative]] schema
    * (doc_id, h0..h{n-1}); `minMatches` of `numHashes` sets the
    * estimated-Jaccard admission threshold. Output: (new_id, hist_id,
    * n_match) for flagged pairs. */
  def incrementalMinhash(historySigs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, shingleK: Int, numHashes: Int,
      rowsPerBand: Int, minMatches: Int): DataFrame = {
    val newSigs = minhashSignaturesNative(
        newDocs, idCol, textCol, shingleK, numHashes)
      .transform(graft.util.CacheScope.persist)
    val hist = graft.util.CacheScope.persist(historySigs)
    val hb = lshBands(hist, numHashes, rowsPerBand)
      .select(col("doc_id").as("hist_id"), col("band"), col("sig"))
    val nb = lshBands(newSigs, numHashes, rowsPerBand)
      .select(col("doc_id").as("new_id"), col("band"), col("sig"))
    val cand = nb.join(hb, Seq("band", "sig"))
      .select(col("new_id"), col("hist_id")).distinct()
    val h = hist.select(col("doc_id").as("hist_id") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"ha$i")): _*)
    val n = newSigs.select(col("doc_id").as("new_id") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"hb$i")): _*)
    val matchCount = (0 until numHashes)
      .map(i => when(col(s"ha$i") === col(s"hb$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(h, "hist_id").join(n, "new_id")
      .withColumn("n_match", matchCount)
      .filter(col("n_match") >= minMatches)
      .select(col("new_id"), col("hist_id"), col("n_match"))
  }

  /** 32-bit SimHash over a distinct feature set (doc_id, sh): per
    * feature, a 32-bit hash from the md5 prefix; per bit, majority vote
    * (+1/-1) across the document's features; signature packs the winning
    * bits. Features should be shingles, not unigrams — on a shared
    * vocabulary, unigram signatures collapse (all docs look alike).
    * expr-built so shift amounts can be columns (the Scala
    * shiftleft/shiftright helpers take only literal amounts) while
    * staying fully codegen'd. */
  def simhash32(features: DataFrame): DataFrame = {
    // 32 conditional-sum aggregates instead of a 32× row explosion:
    // one pass, one shuffle, identical per-bit majority votes.
    val votes = (0 until 32).map(j =>
      sum(expr(s"CASE WHEN shiftright(wh, $j) & 1 = 1 THEN 1 ELSE -1 END"))
        .as(s"s$j"))
    val pack = (0 until 32)
      .map(j => expr(s"CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END"))
      .reduce(_ + _)
    features
      .withColumn("wh", expr("CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), pack.as("simhash"))
  }

  /** Map-side SimHash signatures via the native
    * [[graft.functions.SimHash32]] expression — zero shuffle, identical
    * signatures to [[simhash32]] over the deduplicated feature frame
    * (the expression dedupes shingle strings in-row). */
  def simhash32Native(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= shingleK)
      .select(col("doc_id"), Bridge.column(graft.functions.SimHash32(
        Bridge.expression(col("__w")), shingleK)).as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32-bit signature into four 8-bit
    * keys (pigeonhole: Hamming ≤ 6 pairs in 32 bits could still miss all
    * four bands only if >6 bits differ — with ≤ maxHamming ≤ 7, any pair
    * within threshold shares ≥1 exact band when differences concentrate;
    * standard LSH-for-Hamming recall/precision tradeoff), then verify
    * with bit_count(xor). */
  def simhashPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("bandval", expr("shiftright(simhash, k * 8) & 255"))
      // persist: the 32-aggregate signature pass must not run per side
      // of the band self-join (renames defeat ReuseExchange)
      .transform(graft.util.CacheScope.persist)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.k") === col("b.k") && col("a.bandval") === col("b.bandval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental SimHash near-dup: flag NEW documents whose signature
    * COLLIDES with a STORED signature index on at least one of the
    * 4×8-bit pigeonhole bands and verifies within `maxHamming` bits —
    * the Hamming-space sibling of [[incrementalMinhash]], closing the
    * O(new)-per-day family for the simhash lane. RECALL CAVEAT (the
    * [[simhashPairs]] contract, inherited): with 4 bands the
    * pigeonhole guarantee is total only for Hamming ≤ 3 — a pair with
    * 4–7 differing bits spread across all four blocks shares no band
    * and is silently missed, so `maxHamming` above 3 trades recall
    * for the banding's candidate bound. The index carries
    * (doc_id, simhash) ONLY — 8 bytes per historical document, no
    * text — and is never rescanned beyond one band explode: per batch
    * the cost is map-side native signatures over the NEW docs
    * ([[simhash32Native]], zero shuffle), a pigeonhole band join
    * new×history (4×8-bit blocks: a pair within Hamming ≤ 7 shares at
    * least one exact block whenever differences concentrate — the q18
    * recall/precision tradeoff), and an exact `bit_count(xor)` verify
    * computed from the signatures the band join already carries, so
    * nothing joins back to the corpus.
    *
    * `historySigs` must have the [[simhash32Native]] schema
    * (doc_id, simhash). Output: (new_id, hist_id, hamming) for pairs
    * with hamming <= maxHamming. */
  def incrementalSimhash(historySigs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, shingleK: Int,
      maxHamming: Int): DataFrame = {
    def banded(sigs: DataFrame, side: String): DataFrame =
      sigs.select(col("doc_id").as(s"${side}_id"),
          col("simhash").as(s"${side}_sig"),
          explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("bandval",
          expr(s"shiftright(${side}_sig, k * 8) & 255"))
    val nb = banded(
      simhash32Native(newDocs, idCol, textCol, shingleK), "new")
    val hb = banded(historySigs, "hist")
    nb.join(hb, Seq("k", "bandval"))
      .select(col("new_id"), col("hist_id"),
        expr("bit_count(new_sig ^ hist_sig)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** LSH-propose + exact-Jaccard-verify, candidate-restricted: the
    * propose side computes signatures MAP-SIDE (native MinHashSig — no
    * shingle shuffle at all), and the exploded shingle frame needed for
    * Jaccard is built only for docs that appear in a candidate pair
    * (semi-join first, then persist: the frame feeds both sides of the
    * pair join). At corpus scale this shuffles the shingles of the few
    * proposed docs instead of the whole corpus — the difference between
    * O(candidates) and O(corpus) for the verification stage. */
  def proposeVerify(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val pairs = minhashLsh(docs, idCol, textCol, shingleK, numHashes,
        rowsPerBand)
      .transform(graft.util.CacheScope.persist)
    val candDocs = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol)))
      .distinct()
    val sh = explodedShingles(
        docs.join(candDocs, Seq(idCol), "left_semi"),
        idCol, textCol, shingleK)
      .transform(graft.util.CacheScope.persist)
    ngramJaccardOnShingles(sh, pairs)
  }

  /** Estimator CALIBRATION over the LSH candidate pairs: every proposed
    * pair's exact shingle Jaccard side-by-side with its signature-
    * component match count (n_match / numHashes is the unbiased MinHash
    * Jaccard estimator) and an in-tolerance flag — the audit a pipeline
    * runs before trusting estimator-thresholded admission
    * ([[incrementalMinhash]]'s minMatches) in place of exact verify.
    * Everything emitted is engine-portable: the hash family is the
    * md5-derived Kirsch-Mitzenmacher chain the DuckDB oracle reproduces
    * per-position, so the gate pins the native [[graft.functions.MinHashSig]]
    * expression at per-component granularity (stronger than the q17
    * band-collision check); the flag arithmetic is identical IEEE ops
    * on identical inputs on both sides.
    *
    * Scale shape: signatures are map-side native and persist once for
    * proposing and component-compare; the exact-verify side is the q19
    * candidate-restricted shingle join (linear in |candidates|); the
    * pair-sized exact frame then broadcasts into two joins against the
    * signature table, which streams map-side — nothing corpus-sized
    * crosses an exchange beyond the band join the proposal already
    * pays. */
  def minhashCalibration(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 6, rowsPerBand: Int = 2,
      tolCenti: Int = 50): DataFrame = {
    val sigs = minhashSignaturesNative(docs, idCol, textCol, shingleK,
        numHashes)
      .transform(graft.util.CacheScope.persist)
    val pairs = lshCandidatePairs(lshBands(sigs, numHashes, rowsPerBand))
      .transform(graft.util.CacheScope.persist)
    val candDocs = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol)))
      .distinct()
    // persist: the frame feeds BOTH sides of the pair join plus the
    // per-doc counts (the proposeVerify/containmentPairs discipline) —
    // unpersisted, the split+shingle chain evaluated up to 4× and the
    // explode's size() guard cloned it into a pushed Filter (r18)
    val sh = explodedShingles(
        docs.join(candDocs, Seq(idCol), "left_semi"), idCol, textCol,
        shingleK)
      .transform(graft.util.CacheScope.persist)
    val exact = ngramJaccardOnShingles(sh, pairs)
    val sa = sigs.select(col("doc_id").as("doc_a") +:
      (0 until numHashes).map(h => col(s"h$h").as(s"__a$h")): _*)
    val sb = sigs.select(col("doc_id").as("doc_b") +:
      (0 until numHashes).map(h => col(s"h$h").as(s"__b$h")): _*)
    val nMatch = (0 until numHashes)
      .map(h => when(col(s"__a$h") === col(s"__b$h"), 1L).otherwise(0L))
      .reduce(_ + _)
    exact
      .join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("n_match", nMatch)
      .withColumn("est_ok",
        abs(col("n_match").cast("double") / lit(numHashes.toDouble) -
          col("jaccard")) <= lit(tolCenti / 100.0))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("n_match"),
        col("est_ok"))
  }

  /** CONTAINMENT audit over the LSH candidates: for each proposed pair,
    * shared / min(|A|, |B|) alongside the symmetric Jaccard — the
    * asymmetric metric that catches PARTIAL COPIES (one document
    * embedded in a much larger one: quote farms, boilerplate-wrapped
    * republication), which Jaccard structurally misses (a doc fully
    * contained in one 10× its size has J ≤ 0.1). `partial_copy` flags
    * high containment with low Jaccard — the "same content, different
    * size" signature a near-dup policy treats differently from full
    * duplicates. Thresholds in centi-units so the flag arithmetic is
    * integer-derived and engine-portable.
    *
    * Scale shape identical to [[proposeVerify]]: LSH proposes (Σ
    * bucket² pair space), the shingle join is candidate-restricted.
    * Note the LSH proposal is tuned for Jaccard, so extreme-ratio
    * containments can escape the candidate set (their signatures
    * rarely collide) — at scale, partial-copy hunting lowers
    * rowsPerBand or shingles the SMALLER unit (the [[ParaDedup]]
    * paragraph route); this operator audits the pairs the pipeline
    * already surfaced. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 6, rowsPerBand: Int = 2,
      minContainmentCenti: Int = 80, maxJaccardCenti: Int = 50)
      : DataFrame = {
    val pairs = minhashLsh(docs, idCol, textCol, shingleK, numHashes,
        rowsPerBand)
      .transform(graft.util.CacheScope.persist)
    val candDocs = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol)))
      .distinct()
    val sh = explodedShingles(
        docs.join(candDocs, Seq(idCol), "left_semi"), idCol, textCol,
        shingleK)
      .transform(graft.util.CacheScope.persist)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = pairs
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6))
      .withColumn("containment",
        round(col("shared").cast("double") / least(col("na"), col("nb")), 6))
      .withColumn("partial_copy",
        col("containment") >= lit(minContainmentCenti / 100.0) &&
          col("jaccard") < lit(maxJaccardCenti / 100.0))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard"),
        col("containment"), col("partial_copy"))
  }

  /** Exact shingle-Jaccard verification restricted to candidate pairs —
    * the scale path: the shingle join explodes quadratically on a shared
    * vocabulary when run corpus-wide, but is linear in |candidates| here.
    * Compose with [[minhashLsh]]: LSH proposes, exact Jaccard verifies —
    * or use [[proposeVerify]], which also shares the shingle frame. */
  def ngramJaccardForPairs(docs: DataFrame, pairs: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame =
    ngramJaccardOnShingles(explodedShingles(docs, idCol, textCol, k), pairs)

  /** Jaccard verification over a PREBUILT distinct (doc_id, sh) frame —
    * lets callers share one shingle frame across propose and verify. */
  def ngramJaccardOnShingles(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = pairs
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard"))
  }

  /** Incremental exact dedup of a NEW batch against corpus history:
    * the history side is a 16-byte FINGERPRINT table (never the bodies),
    * so the daily cost is O(new) — one left-semi-shaped join of the new
    * batch's fingerprints against the known set, plus the intra-batch
    * exact grouping. At 100 TB the fingerprint table is itself bucketed
    * on the digest so the join co-locates without a shuffle of history.
    * Output: one row per new doc — (doc_id, fp, dup_of_history,
    * intra_keep) where intra_keep marks the smallest-id copy within the
    * new batch. */
  def incrementalExact(newDocs: DataFrame, knownFps: DataFrame,
      idCol: String, textCol: String, fpCol: String): DataFrame = {
    val withFp = newDocs.select(col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("fp"))
    val known = knownFps.select(col(fpCol).as("fp")).distinct()
      .withColumn("__known", lit(true))
    val intraKeep = withFp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("__keep_id"))
    withFp
      .join(known, Seq("fp"), "left")
      .join(intraKeep, Seq("fp"))
      .select(col("doc_id"), col("fp"),
        coalesce(col("__known"), lit(false)).as("dup_of_history"),
        (col("doc_id") === col("__keep_id")).as("intra_keep"))
  }

  /** [[incrementalExact]] with a Bloom-filter membership pre-filter —
    * the 100 TB form of "is this fingerprint in history?". Same output,
    * same exactness; different join volume:
    *
    * [[incrementalExact]] shuffles EVERY new fingerprint against the
    * known-fingerprint table. Here the history side is first folded into
    * a Bloom filter (one map-side-combining aggregate over the
    * fingerprint table — the exchange carries one sketch per partition,
    * not the fingerprints), attached to the new batch's scan as a
    * SCALAR SUBQUERY — the exact mechanism Spark's own
    * InjectRuntimeFilter uses for runtime bloom joins, reusing Spark's
    * `BloomFilterAggregate`/`BloomFilterMightContain` expressions rather
    * than reinventing them. New rows the bloom rejects are DEFINITIVELY
    * absent from history (no false negatives) and never reach the join;
    * only candidates — true dups plus an fpp-sized sliver of false
    * positives — are verified with the exact semi-join, which removes
    * the false positives. Result: bit-identical to [[incrementalExact]],
    * and history fingerprints NEVER cross an exchange: the bloom build
    * partial-combines to one sketch per partition, and the verify
    * semi-join probes history map-side against the broadcast candidate
    * set (~(dup_rate + fpp) of the batch, distinct). Size
    * `expectedItems` to the history fingerprint cardinality; bits scale
    * as ~1.2 GB per billion at fpp=0.03, broadcast once per executor by
    * the subquery result.
    *
    * Sizing guard: Spark's `BloomFilterAggregate` SILENTLY clamps both
    * arguments via `Math.min` against
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4M) and `...maxNumBits` (default 64M bits = 8 MB). Above the caps
    * the fpp degrades quietly — the candidate set approaches the whole
    * batch and `broadcast(candidates)` grows toward batch size — so
    * billion-row histories need BOTH confs raised first (≈1.44·n·|ln
    * fpp|/ln²2 bits). This operator fails fast at plan time instead of
    * silently losing its advertised scale behavior. */
  def incrementalExactBloom(newDocs: DataFrame, knownFps: DataFrame,
      idCol: String, textCol: String, fpCol: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.03): DataFrame = {
    val withFp = newDocs.select(col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("fp"))
    val flagged = bloomKnownFlag(withFp, "fp", knownFps, fpCol,
      expectedItems, fpp)
    val intraKeep = withFp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("__keep_id"))
    flagged
      .join(intraKeep, Seq("fp"))
      .select(col("doc_id"), col("fp"),
        col("__known_flag").as("dup_of_history"),
        (col("doc_id") === col("__keep_id")).as("intra_keep"))
  }

  /** The bloom-gated EXACT membership core shared by
    * [[incrementalExactBloom]] and [[ParaDedup.incrementalKeepFirst]]:
    * returns `rows` plus a `__known_flag` boolean — true iff
    * rows(`fpCol`) appears in `knownFps`(`knownFpCol`) — with the
    * history side never crossing an exchange.
    *
    * NO distinct on the history side anywhere: a distinct is an
    * aggregation that exchanges every history fingerprint — the exact
    * cost this helper exists to avoid. The bloom is a set (duplicate
    * inserts are no-ops) and the semi join below tolerates duplicate
    * rows because the distinct runs AFTER the candidate restriction.
    *
    * Exact verify touches ONLY the candidate fingerprints
    * (distinct-first: the history join sees each candidate fp once, not
    * once per copy). JOIN DIRECTION matters at scale: LeftSemi can only
    * build (and broadcast) its RIGHT side, so `candidates semi known`
    * would shuffle the whole history table. `known semi
    * broadcast(candidates)` probes history MAP-SIDE against the small
    * broadcast candidate set — history fingerprints never cross an
    * exchange, in the bloom build (partial-combined sketches) or the
    * verify. */
  private[operators] def bloomKnownFlag(rows: DataFrame, fpCol: String,
      knownFps: DataFrame, knownFpCol: String,
      expectedItems: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val known = knownFps.select(col(knownFpCol).as("fp"))
    // 1-row bloom plan over history; ln-formula for optimal bit count
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // fail fast where BloomFilterAggregate would silently Math.min-clamp
    val conf = rows.sparkSession.conf
    val maxItems =
      conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits =
      conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sizing (expectedItems=$expectedItems -> numBits=$numBits) " +
        s"exceeds BloomFilterAggregate's clamp confs (maxNumItems=$maxItems, " +
        "maxNumBits=" + maxBits + "); raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems / .maxNumBits " +
        "or the fpp silently degrades and the candidate broadcast grows " +
        "toward batch size")
    val bloomDf = known.select(Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("fp"))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()))
    val maybe = rows.withColumn("__maybe", Bridge.column(
      BloomFilterMightContain(
        ScalarSubquery(Bridge.analyzed(bloomDf)),
        Bridge.expression(xxhash64(col(fpCol))))))
    val candidates = maybe.filter(col("__maybe"))
      .select(col(fpCol).as("fp")).distinct()
    val confirmed = known.join(broadcast(candidates), Seq("fp"), "left_semi")
      .distinct() // candidate-restricted first — this exchange is O(candidates)
      .select(col("fp").as("__kfp"))
      .withColumn("__known", lit(true))
    maybe
      .join(broadcast(confirmed), col(fpCol) === col("__kfp"), "left")
      .withColumn("__known_flag", coalesce(col("__known"), lit(false)))
      .drop("__kfp", "__known", "__maybe")
  }

  /** Duplicate-CLUSTER assignment from candidate pairs: connected
    * components by iterative min-label propagation — each round every
    * node takes the min label over itself and its neighbors; converged
    * when no label changes. Dedup graphs are near-cliques (every member
    * pairs with most others), so the diameter — and the round count —
    * is tiny; each round is one distributed join + group-min, and the
    * driver touches only the convergence counter. For adversarially
    * long chains the alternating large-star/small-star contraction
    * bounds rounds at O(log²n); not needed for dup graphs.
    * Output: (doc_id, cluster_id, cluster_size) for every doc in a
    * pair, cluster_id = smallest doc_id reachable. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .transform(graft.util.CacheScope.persist)
    // Each round folds its OWN convergence evidence into the aggregate:
    // alongside min(lbl), the self row (tagged __self) carries the
    // node's previous label out as __prev, so "did anything change" is
    // a filter over the round's checkpoint — no separate old-vs-new
    // compare join per round. Round 1 needs no join at all: from
    // identity labels, propagate(join) ≡ the edge list itself, so the
    // neighborhood min comes straight off `edges` (and the identity
    // label table + its checkpoint disappear). For a daily contraction
    // graph of stars (diameter ≤ 2, the incrementalDupClusters common
    // case) the whole run is one join-free census + one confirming
    // propagate round.
    //
    // Each round references `labels` twice (join side + union side), so
    // without truncation the logical plan DOUBLES per iteration — by
    // round ~8 plan stringification alone OOMs. localCheckpoint
    // materializes the round's labels and CUTS the lineage, the standard
    // shape for iterative Spark algorithms (on a cluster with flaky
    // executors, prefer reliable checkpoint() to a checkpoint dir).
    def census(rows: DataFrame): DataFrame = rows
      .groupBy(col("id"))
      .agg(min(col("lbl")).as("lbl"),
        min(when(col("__self"), col("lbl"))).as("__prev"))
      .localCheckpoint()
    var labels = census(
      edges.select(col("dst").as("id"), col("src").as("lbl"),
          lit(false).as("__self"))
        .unionByName(edges.select(col("src").as("id"), col("src").as("lbl"),
          lit(true).as("__self"))))
    var converged =
      labels.filter(col("lbl") =!= col("__prev")).limit(1).count() == 0
    var iter = 1
    while (!converged && iter < maxIter) {
      val propagated = census(labels
        .join(edges, labels("id") === edges("src"))
        .select(col("dst").as("id"), col("lbl"), lit(false).as("__self"))
        .unionByName(labels.select(col("id"), col("lbl"),
          lit(true).as("__self"))))
      val changed =
        propagated.filter(col("lbl") =!= col("__prev")).limit(1).count()
      // the superseded round's checkpoint blocks are dead the moment
      // `labels` is reassigned, but only a driver GC would reclaim them
      // (they bypass the CacheManager) — free them eagerly or a long
      // single-JVM run accrues one dead label table per round
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(labels)
      labels = propagated
      converged = changed == 0
      iter += 1
    }
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"))
  }

  /** O(new)-per-day sibling of [[dupClusters]] — the last member of the
    * incremental family (exact q65/q116, minhash q108, paragraph q122,
    * ANN q110, datasheet q132, domain q140): yesterday's cluster
    * LEDGER (doc_id, cluster_id, cluster_size) plus the stored
    * signature index absorb a new batch without re-clustering history.
    *
    * The trick is GRAPH CONTRACTION: history-internal edges cannot
    * change (band signatures are per-doc), so every existing cluster
    * collapses to ONE node named by its cluster id — which, by the
    * [[dupClusters]] min-member contract, IS the min doc id, so the
    * contracted component's min-label equals the full graph's. The
    * propagation graph is only: new×new candidate pairs, plus each
    * new×history match contracted to (new_id, cluster-or-self node).
    * History docs the index matches but the ledger doesn't know
    * (in-history singletons) join as themselves. Min-label propagation
    * runs on this BATCH-SIZED graph; component sizes re-derive as
    * Σ old cluster sizes + matched singletons + new members (each
    * node weighted once). The output is the full updated ledger:
    * untouched history rows pass through via a broadcast-miss, touched
    * clusters remap id+size, matched singletons and new edge-docs
    * append — bit-identical to [[dupClusters]] over history ∪ batch
    * (the q144 gate proves it against the full-recompute oracle).
    *
    * Scale shape: the daily cost is the new batch's signatures (map-
    * side native), one (band, sig) join against the stored index, the
    * propagation over the contracted graph (nodes ≈ |batch| + touched
    * clusters), and one broadcast remap over the ledger scan — history
    * text is never read, history edges never recomputed. */
  def incrementalDupClusters(ledger: DataFrame, historySigs: DataFrame,
      newBatch: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val newSigs = minhashSignaturesNative(newBatch, idCol, textCol,
        shingleK, numHashes)
      .transform(graft.util.CacheScope.persist)
    val nb = lshBands(newSigs, numHashes, rowsPerBand)
      .select(col("doc_id").as("new_id"), col("band"), col("sig"))
      .transform(graft.util.CacheScope.persist)
    val hb = lshBands(historySigs, numHashes, rowsPerBand)
      .select(col("doc_id").as("hist_id"), col("band"), col("sig"))
    val nnPairs = nb.alias("a")
      .join(nb.alias("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.new_id") < col("b.new_id"))
      .select(col("a.new_id").as("doc_a"), col("b.new_id").as("doc_b"))
      .distinct()
    val led = ledger.select(col("doc_id").as("hist_id"),
      col("cluster_id"), col("cluster_size"))
    val nhLinks = nb
      .join(hb, Seq("band", "sig"))
      .select(col("new_id"), col("hist_id")).distinct()
      .join(led.select(col("hist_id"), col("cluster_id")),
        Seq("hist_id"), "left")
      // ledgered history doc → its cluster node; in-history singleton
      // (index hit, no ledger row) → itself
      .select(col("new_id").as("doc_a"),
        coalesce(col("cluster_id"), col("hist_id")).as("doc_b"))
      .distinct()
    val comp = dupClusters(nnPairs.unionByName(nhLinks))
      .select(col("doc_id").as("node"), col("cluster_id").as("lbl"))
      .transform(graft.util.CacheScope.persist)
    // node weights: an old-cluster node carries its member count, new
    // docs and matched singletons weigh 1; sizes fold per component
    val oldSizes = led.select(col("cluster_id").as("node"),
      col("cluster_size").as("__w")).distinct()
    val compSizes = comp
      .join(oldSizes, Seq("node"), "left")
      .withColumn("__w", coalesce(col("__w"), lit(1L)))
      .groupBy(col("lbl"))
      .agg(sum(col("__w")).cast("long").as("new_size"))
    val labeled = comp.join(compSizes, Seq("lbl"))
      .transform(graft.util.CacheScope.persist)
    // 1. touched old clusters remap (broadcast: the touched set is
    //    batch-bounded); untouched ledger rows miss and pass through
    val clusterRemap = labeled
      .join(oldSizes.select(col("node")), Seq("node"))
      .select(col("node").as("__old_cid"), col("lbl").as("__new_cid"),
        col("new_size"))
    val remapped = ledger
      .join(broadcast(clusterRemap),
        col("cluster_id") === col("__old_cid"), "left")
      .select(col("doc_id"),
        coalesce(col("__new_cid"), col("cluster_id")).as("cluster_id"),
        coalesce(col("new_size"), col("cluster_size")).as("cluster_size"))
    // 2. every non-cluster node (new edge-docs + matched in-history
    //    singletons) appends with its component label
    val appended = labeled
      .join(oldSizes.select(col("node")), Seq("node"), "left_anti")
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        col("new_size").as("cluster_size"))
    remapped.unionByName(appended)
  }

  /** Canonical-representative election per duplicate cluster — the
    * decision step AFTER [[dupClusters]]: near-dup clustering tells you
    * which documents are copies of each other; this picks WHICH copy the
    * training set keeps. Heuristic: most whitespace tokens first (the
    * keep-longest rule — truncated/boilerplate-stripped variants lose to
    * the fullest copy), smallest id on ties so the election is
    * deterministic. Documents in no cluster are their own singleton
    * canon. Output per doc: (idCol, cluster_id, canon_id, is_canon,
    * n_tokens) — a total ledger (every input doc appears exactly once),
    * so `filter(is_canon)` is the deduplicated corpus and the ledger
    * itself is the redirect map for provenance.
    *
    * Scale shape: the election is an argmin AGGREGATE —
    * min(struct(-n_tokens, id)) per cluster — which partial-combines
    * map-side to one row per cluster per task; no window, nothing
    * corpus-wide sorts. The canon table (one row per cluster) joins back
    * to members keyed by cluster_id, the same exchange the labels
    * already have. `labels` may cover only clustered docs (as
    * [[dupClusters]] emits); the left join + coalesce supplies the
    * singleton identity rows without densifying the labels table.
    * PRECONDITION (the [[dupClusters]] min-label invariant): every
    * cluster_id is the id of one of the cluster's MEMBERS — an
    * arbitrary external label could collide with an unlabeled doc's
    * singleton id and merge the two spuriously. */
  def electCanonical(docs: DataFrame, labels: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val member = docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(labels.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    val canon = member
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("n_tokens")).as("neg_tokens"),
        col(idCol).as("id"))).as("best"))
      .select(col("cluster_id"), col("best.id").as("canon_id"))
    member.join(canon, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("canon_id"),
        (col(idCol) === col("canon_id")).as("is_canon"), col("n_tokens"))
  }

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.
    * shared/(|A|+|B|-shared); join on the shingle, then one groupBy per
    * pair. At scale, run on LSH candidates instead of all sharing pairs
    * (compose with [[minhashLsh]]). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minJaccard: Double): DataFrame = {
    val sh = explodedShingles(docs, idCol, textCol, k)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a")
    val b = sh.as("b")
    val shared = a.join(b,
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard"))
  }

  /** EXACT shared-span detection — the substring-dedup primitive of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2022), word-granular: every maximal run of ≥ `minSpan`
    * consecutive shared words between two documents, found WITHOUT a
    * suffix array via rare-shingle anchoring + gaps-and-islands.
    *
    * Pipeline: positioned word `k`-shingle fingerprints (60-bit md5
    * prefix — text never leaves the row; the fingerprint is what
    * shuffles) → anchor census keeps fingerprints appearing in 2..
    * `maxDf` DISTINCT docs (df=1 can't pair; df>maxDf is boilerplate
    * whose pair fan-out is df² — the cap is what bounds the join at
    * corpus scale, exactly the candidate-bounding role LSH bands play
    * for whole-doc dedup) → fp-keyed self-join (doc_a < doc_b) → on
    * each pair DIAGONAL (pos_a - pos_b), consecutive pos_a runs are
    * maximal shared spans: island id = pos_a - row_number, one window
    * partitioned by (doc_a, doc_b, diag) — fine-grained keys, never a
    * single-partition window. A run of n matching shingles certifies
    * n + k - 1 identically-ordered shared words.
    *
    * Conservative by construction: an over-`maxDf` shingle INSIDE a
    * long span splits its island (both halves still report if ≥
    * minSpan) — reported spans are always truly shared; a production
    * pass stitches islands whose gap ≤ k when totality matters more
    * than anchor cost.
    *
    * Relation to [[SpanDedup.duplicatedSpans]] (q88): that operator
    * flags a doc's OWN regions whose shingles repeat anywhere
    * corpus-wide — cheap (no self-join) but attribution-free, so a
    * keep-first cut is impossible (it would redact every copy,
    * including the one that should survive). This pair form buys the
    * partner doc and the diagonal alignment, which is what
    * [[redactSharedSpans]]'s asymmetric keep-smallest-id policy needs. Output: (doc_a, doc_b, start_a, start_b,
    * span_words), positions 1-based over normalized words; (start_a,
    * start_b) determines the diagonal, so the ordering is total. */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, maxDf: Int): DataFrame = {
    require(k >= 2, s"k=$k: span anchoring needs shingles, not words")
    require(minSpan >= k,
      s"minSpan=$minSpan < k=$k can never be certified by a k-shingle run")
    val pos = positionedShingleFps(docs, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist) // census + both join sides
    val anchors = pos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val qual = pos.join(anchors, Seq("fp")) // fp-keyed; ints only
    val matched = qual.as("a")
      .join(qual.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    spansFromMatches(matched, k, minSpan)
  }

  /** Gaps-and-islands tail shared by [[sharedSpans]] and
    * [[incrementalSharedSpans]]: matched position pairs → maximal
    * consecutive runs per (pair, diagonal) → spans ≥ minSpan. The
    * window partitions by (doc_a, doc_b, diag) — match-pair-grained
    * keys, never a single-partition window. */
  private def spansFromMatches(matched: DataFrame, k: Int,
      minSpan: Int): DataFrame =
    islandsFromMatches(matched, k)
      .filter(col("span_words") >= minSpan)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_words"))

  /** Raw maximal islands (no minSpan cut): one row per consecutive
    * matched run per (pair, diagonal), with `diag` retained for
    * downstream stitching. */
  private[operators] def islandsFromMatches(matched: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    matched
      .withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + lit(k - 1).cast("long")).as("span_words"))
      .select(col("doc_a"), col("doc_b"), col("diag"), col("start_a"),
        col("start_b"), col("span_words"))
  }

  /** GAP-TOLERANT form of [[sharedSpans]] — the "production stitching
    * pass" that scaladoc names: islands on the SAME pair diagonal whose
    * word gap is ≤ `maxGap` merge into one reported region, so a long
    * shared span split by an over-`maxDf` boilerplate shingle (or by a
    * small local edit under the same alignment) reports as the single
    * near-contiguous duplication it is. `span_words` is the covered
    * WIDTH including tolerated gaps; `n_islands` says how many exact
    * runs back it (1 = purely exact — the q153 row). Islands at
    * shingle distance < k overlap at word level (negative gap) and
    * always stitch. Same shuffle geometry as [[sharedSpans]]: the
    * stitch is a second lag+running-sum window over ISLAND rows —
    * pair-diagonal-keyed, island-sized input, nothing corpus-wide. */
  def sharedSpansStitched(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, maxDf: Int, maxGap: Int): DataFrame = {
    require(maxGap >= 0, s"maxGap=$maxGap must be >= 0")
    require(k >= 2 && minSpan >= k,
      s"minSpan=$minSpan / k=$k: need minSpan >= k >= 2")
    val pos = positionedShingleFps(docs, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val anchors = pos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val qual = pos.join(anchors, Seq("fp"))
    val matched = qual.as("a")
      .join(qual.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    stitchIslands(islandsFromMatches(matched, k), minSpan, maxGap)
  }

  /** Stitch tail of [[sharedSpansStitched]], separated for reuse over
    * incrementally-produced islands. */
  private[operators] def stitchIslands(islands: DataFrame, minSpan: Int,
      maxGap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDiag = Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("start_a"))
    val run = byDiag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevEnd = lag(col("start_a") + col("span_words") - 1, 1).over(byDiag)
    islands
      .withColumn("__brk",
        when(prevEnd.isNull ||
          col("start_a") - prevEnd - 1 > maxGap, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(run))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("__sid"))
      .agg(min(col("start_a")).as("start_a"), min(col("start_b")).as("start_b"),
        (max(col("start_a") + col("span_words")) - min(col("start_a")))
          .as("span_words"),
        count(lit(1)).as("n_islands"))
      .filter(col("span_words") >= minSpan)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_words"), col("n_islands"))
  }

  /** O(new) DAILY form of [[sharedSpans]]: spans between a new batch
    * and the corpus (history ∪ batch) with at least one BATCH endpoint,
    * identical to running the batch form over history ∪ batch and
    * keeping the pairs that touch the batch — without re-shingling
    * history. `historyIndex` is the stored positioned-fingerprint table
    * ([[positionedShingleFps]] shape) and `historyCensus` the stored
    * per-fp distinct-doc census; history and batch doc ids must be
    * disjoint (append-only corpus).
    *
    * Why the equivalence is exact: every match in a qualifying pair
    * involves a fingerprint PRESENT IN A BATCH DOC (both endpoints of a
    * match contain the shingle), so anchors only need df for
    * batch-present fps — and that df merges exactly (distinct-doc
    * counts over disjoint id sets add). The stored tables never cross
    * an exchange un-filtered: the batch fp set broadcasts into a
    * semi-join on the census and index scans (the q147 stored-side
    * discipline), so only history rows matching a batch anchor — a
    * batch-proportional slice — reach the pair join, which itself
    * builds broadcast on the batch side. The one keyed shuffle is the
    * islands window over MATCHED pairs, O(batch matches). Oracle = the
    * plain full recompute filtered to batch-touching pairs; the hash
    * match proves the merge is a pure optimization (q65/q108/q132
    * family). */
  def incrementalSharedSpans(historyIndex: DataFrame,
      historyCensus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, k: Int, minSpan: Int, maxDf: Int): DataFrame = {
    require(minSpan >= k,
      s"minSpan=$minSpan < k=$k can never be certified by a k-shingle run")
    val bpos = positionedShingleFps(batch, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val bCensus = bpos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("__dfb"))
      .transform(graft.util.CacheScope.persist)
    // merged df for batch-present fps only: the stored census is
    // semi-filtered by the broadcast batch fp set, never shuffled
    val dfh = historyCensus
      .join(broadcast(bCensus.select(col("fp"))), Seq("fp"), "left_semi")
    val anchors = bCensus
      .join(dfh, Seq("fp"), "left")
      .select(col("fp"),
        (col("__dfb") + coalesce(col("df"), lit(0L))).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDf)
      .select(col("fp"))
      .transform(graft.util.CacheScope.persist)
    val bq = bpos.join(broadcast(anchors), Seq("fp"))
    val hq = historyIndex
      .join(broadcast(anchors), Seq("fp"), "left_semi")
      .select(col("doc_id"), col("pos"), col("fp"))
    val all = hq.unionByName(bq.select(col("doc_id"), col("pos"), col("fp")))
    // pairs with >= 1 batch endpoint, each exactly once:
    //   p1: a ∈ history ∪ batch, b ∈ batch, a.id < b.id
    //   p2: a ∈ batch, b ∈ history, a.id < b.id   (disjoint from p1 by
    //       b's provenance)
    def pairs(aSide: DataFrame, bSide: DataFrame) =
      aSide.as("a").join(bSide.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    val p1 = pairs(all, broadcast(bq))
    val p2 = pairs(broadcast(bq), hq)
    spansFromMatches(p1.unionByName(p2), k, minSpan)
  }

  /** Positioned shingle fingerprints: (doc_id, pos, fp) — pos is the
    * 1-based word index of the shingle's first word, fp the 60-bit
    * md5-prefix of the k-word shingle (the [[minhashSignatures]] kh1
    * family, engine-portable). Within-doc repeats keep every position. */
  private[graft] def positionedShingleFps(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        posexplode(wordShingles(col("__w"), k)).as(Seq("__p", "__sh")))
      .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"),
        expr("CAST(conv(substring(md5(__sh), 1, 15), 16, 10) AS BIGINT)")
          .as("fp"))

  /** WINNOWING fingerprint selection (Schleimer–Wilkerson–Aiken, the
    * MOSS algorithm): instead of indexing EVERY k-shingle
    * ([[positionedShingleFps]] — m fingerprints per doc), keep only
    * the minimum hash of each sliding window of `windowW` consecutive
    * shingle hashes (rightmost on ties, the standard rule) — expected
    * density 2/(windowW+1), an index ~w/2× smaller, with the winnowing
    * GUARANTEE intact: any shared run of at least windowW+k-1 words
    * still shares at least one selected fingerprint, so span detection
    * over winnowed fingerprints misses nothing longer than that
    * threshold. This is the index-size lever for [[sharedSpans]]-class
    * detection at 100 TB: the posting list shrinks before it ever
    * reaches an exchange.
    *
    * The selection is IN-ROW (shingle → hash → window-argmin are
    * `transform`/`filter` lambdas over the hash array) and
    * map-side: the only rows emitted are the selected (doc_id, pos,
    * fp) fingerprints. The hash array MATERIALIZES behind a
    * CacheScope barrier before the selection lambdas touch it — binding
    * it to a column is NOT enough, CollapseProject inlines straight
    * through into the lambda body, and every `element_at(__kh, p)`
    * then re-splits and re-hashes the whole document (measured: one
    * 500-doc slice pinned a core for 10+ minutes; with the barrier it
    * is sub-second). The persisted frame carries hashes only
    * (~8 B/word, CacheScope-freed). Documents shorter than `windowW`
    * shingles keep their global minimum (one fingerprint) — the
    * standard short-doc degenerate case.
    *
    * Selection form (r18 optimization — bit-identical output, guide
    * §1.2 "per-task work"): instead of materializing every window's
    * rightmost argmin (an `aggregate` allocating a struct per window
    * step, then `array_distinct` over the winner structs — O(m·w)
    * struct churn per doc, all interpreted since higher-order
    * functions never enter whole-stage codegen), each position p
    * decides IN PLACE whether SOME window elects it, from two local
    * probes: the nearest previous strictly-smaller hash and the
    * nearest next smaller-or-equal hash within w−1 positions. p wins
    * window j iff j reaches past neither probe, so a qualifying j
    * exists iff max(1, p−w+1, prevLt+1) ≤ min(p, m−w+1 floor-capped,
    * nextLe−w). That is ≤ 2(w−1) `element_at` comparisons per
    * position, no allocation, no distinct — and the result set is
    * exactly the argmin winners (ties break rightmost both ways:
    * strict `<` backward, `≤` forward). The explode is `explode_outer`
    * DELIBERATELY: with a plain explode, InferFiltersFromGenerate
    * manufactures a `size(sel) > 0` predicate and PushDownPredicates
    * clones the whole O(m·w) selection expression into it, doubling
    * the fold (measured in q166's plan: the fold appeared in both
    * Filter and Project). The `size(__kh) >= 1` guard above the
    * explode makes the selected array provably non-empty (every
    * non-empty hash array elects at least window 1's winner), so
    * outer ≡ inner here and no null row can emerge. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, windowW: Int): DataFrame = {
    require(windowW >= 1, s"windowW=$windowW must be >= 1")
    val w = windowW
    val selExpr =
      if (w == 1) "sequence(1, size(__kh))"
      else {
        // prevLt+1: smallest backward offset o with kh[p-o] < kh[p]
        // wins ⇒ the window floor is (p-o)+1; no such o ⇒ floor 1.
        val prevCases = (1 until w).map { o =>
          s"WHEN p > $o AND element_at(__kh, p - $o) < " +
            s"element_at(__kh, p) THEN p - ${o - 1}"
        }.mkString(" ")
        // nextLe−w: smallest forward offset o with kh[p+o] <= kh[p]
        // caps the window start at (p+o)−w; no such o ⇒ unconstrained.
        val nextCases = (1 until w).map { o =>
          s"WHEN p + $o <= size(__kh) AND element_at(__kh, p + $o) <= " +
            s"element_at(__kh, p) THEN p + $o - $w"
        }.mkString(" ")
        s"""filter(sequence(1, size(__kh)), p ->
          greatest(1, p - ${w - 1}, CASE $prevCases ELSE 1 END)
          <= least(p, greatest(size(__kh) - ${w - 1}, 1),
                   CASE $nextCases ELSE 2147483647 END))"""
      }
    docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .withColumn("__sh", wordShingles(col("__w"), k))
      .select(col("doc_id"), expr(
        "transform(__sh, x -> " +
          "CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT))")
        .as("__kh"))
      .transform(graft.util.CacheScope.persist)
      // the short-doc cut moved ABOVE the barrier (reads the cached
      // array's size) — below it, PushDownPredicates duplicated the
      // whole split+normalize chain into the fill scan's Filter
      .filter(size(col("__kh")) >= 1)
      .select(col("doc_id"), col("__kh"),
        explode_outer(expr(selExpr)).as("__p"))
      .select(col("doc_id"), col("__p").cast("long").as("pos"),
        expr("element_at(__kh, __p)").as("fp"))
  }

  /** Candidate near-dup pairs over the WINNOWED index: docs sharing at
    * least `minShared` selected fingerprints — the
    * [[winnowFingerprints]] payoff measured end-to-end. The posting
    * list this self-joins is ~windowW/2× smaller than the full
    * positional shingle index, so the Σ posting² pair-candidate cost
    * shrinks ~(w/2)² while the winnowing guarantee bounds what can be
    * missed (no copied run ≥ windowW+k-1 words loses all its
    * fingerprints). DISTINCT (doc, fp) before the join: within-doc
    * repeats must not inflate the shared count. Output: (doc_a, doc_b,
    * n_shared) with doc_a < doc_b. */
  def winnowCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, windowW: Int, minShared: Int): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, windowW)
      .select(col("doc_id"), col("fp")).distinct()
      .transform(graft.util.CacheScope.persist)
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** O(new) DAILY form of [[winnowCandidatePairs]] — what a 100 TB
    * substring-dedup deployment actually runs: the STORED index is the
    * winnowed one (~windowW/2× smaller than the full positional index
    * [[incrementalSharedSpans]] maintains), and a day's batch joins it
    * without the corpus ever being re-fingerprinted. Output: candidate
    * pairs with at least one BATCH endpoint sharing ≥ `minShared`
    * selected fingerprints — exactly the batch recompute over
    * history ∪ batch restricted to batch-touching pairs.
    *
    * Why the merge is exact: winnowed selection is PER-DOC (the
    * window-argmin sees only the doc's own hash sequence), so history
    * rows are untouched by the batch's arrival and the combined index
    * is the plain union — no census to reconcile, unlike the
    * df-dependent anchors of [[incrementalSharedSpans]]. Stored-side
    * discipline (the q147/q156 rule): the batch fp set BROADCASTS into
    * a semi-join on the stored index scan, so only history rows
    * colliding with a batch fingerprint — a batch-proportional slice —
    * survive to the distinct + pair join, which builds broadcast on
    * the batch side. History and batch doc ids must be disjoint
    * (append-only corpus).
    *
    * `historyIndex` is the stored [[winnowFingerprints]] output
    * (doc_id, pos, fp) — positions ride along for span-capable
    * consumers and are ignored here. */
  def incrementalWinnowPairs(historyIndex: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int, windowW: Int,
      minShared: Int): DataFrame = {
    val bfps = winnowFingerprints(batch, idCol, textCol, k, windowW)
      .select(col("doc_id"), col("fp")).distinct()
      .transform(graft.util.CacheScope.persist)
    // the semi-join probe broadcasts bfps AS IS — an extra
    // fp-only distinct would re-shuffle the whole batch fp set just to
    // shrink a broadcast that is already batch-bounded (duplicate hash
    // keys are harmless in a semi-join build)
    val hq = historyIndex
      .join(broadcast(bfps), Seq("fp"), "left_semi")
      .select(col("doc_id"), col("fp")).distinct()
      .transform(graft.util.CacheScope.persist)
    val all = hq.unionByName(bfps)
    // pairs with >= 1 batch endpoint, each exactly once (the q156
    // provenance split): p1 covers b ∈ batch, p2 covers a ∈ batch
    // with b ∈ history — disjoint by b's provenance.
    def pairs(aSide: DataFrame, bSide: DataFrame) =
      aSide.as("a").join(bSide.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    pairs(all, broadcast(bfps)).unionByName(pairs(broadcast(bfps), hq))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** PROPOSE-VERIFY shared spans — the 100 TB form of [[sharedSpans]]:
    * winnowed candidate pairs propose ([[winnowCandidatePairs]] — the
    * posting-list self-join runs on the ~windowW/2×-smaller selected
    * index), then the exact positional machinery verifies ONLY over
    * candidate documents, so the full shingle index is built for a
    * candidate-proportional slice of the corpus instead of all of it.
    * The q19 propose/verify discipline applied at span granularity.
    *
    * Stages: (1) candidate pairs sharing ≥ `minShared` selected
    * fingerprints; (2) the candidate DOC set semi-joins the corpus —
    * SIZE-GATED, not pinned broadcast: candidate incidence tracks
    * duplication incidence, which at crawl scale is 30–50% of docs,
    * so AQE picks broadcast when the set is small and a doc-keyed
    * shuffled semi-join when it is corpus-proportional — and only
    * those docs re-shingle positionally; (3) the
    * [[sharedSpans]] anchor census (2 ≤ df ≤ maxDf, df measured over
    * candidate docs), fp-keyed pair join restricted to the proposed
    * pairs, gaps-and-islands per pair diagonal. Miss class is NAMED:
    * a pair every one of whose shared runs is shorter than
    * windowW + k − 1 words, or that shares fewer than `minShared`
    * selected fingerprints, is never examined — at the default
    * (windowW=4, minShared=2) the driver-gate corpus loses zero of
    * q153's spans while touching only candidate docs.
    *
    * Output: (doc_a, doc_b, start_a, start_b, span_words) — the
    * [[sharedSpans]] schema, restricted to proposed pairs. */
  def winnowedSharedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, maxDf: Int, windowW: Int,
      minShared: Int): DataFrame = {
    require(k >= 2 && minSpan >= k,
      s"minSpan=$minSpan / k=$k: need minSpan >= k >= 2")
    val cand = winnowCandidatePairs(docs, idCol, textCol, k, windowW,
        minShared)
      .select(col("doc_a"), col("doc_b"))
      .transform(graft.util.CacheScope.persist)
    val candDocs = cand.select(col("doc_a").as("__cid"))
      .unionByName(cand.select(col("doc_b").as("__cid"))).distinct()
    // no pinned hint on the candidate-set joins: AQE's runtime stats
    // size-gate them (the cutPositions "auto" discipline) — a crawl
    // where half the docs are candidates must be allowed to shuffle
    val pos = positionedShingleFps(
        docs.join(candDocs, docs(idCol) === col("__cid"), "left_semi"),
        idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val anchors = pos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val qual = pos.join(anchors, Seq("fp"))
    val matched = qual.as("a")
      .join(qual.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    spansFromMatches(matched, k, minSpan)
  }

  /** Span REDACTION — the transform [[sharedSpans]] is the analysis
    * for: keep-first at span granularity. Every detected span's words
    * are cut from the LARGER doc id of its pair (the smaller-id copy
    * stays intact — keep-smallest-id, the [[exact]] discipline applied
    * to partial copies); the survivor text is the normalized words
    * minus redacted positions, reassembled in order.
    *
    * Scale shape: the removal table is (doc_id, positions[]) for
    * AFFECTED docs only, and the word cut and reassembly are in-row
    * (two-arg lambda `filter` over the bound word array; per-word
    * `array_contains` against the doc's own removal list, which is
    * span-sized). The removal join is SIZE-GATED via `removalJoin` —
    * see [[cutPositions]] for the three modes; the default lets AQE's
    * runtime statistics pick broadcast when the affected-doc set is
    * small and a doc_id-keyed shuffled hash join when it is
    * corpus-proportional (crawl-scale duplication incidence is
    * 30–50% of documents, where an unconditional broadcast OOMs the
    * driver). Output: (doc_id, kept_text, n_removed) for EVERY input
    * doc, kept_text normalized. */
  def redactSharedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, maxDf: Int,
      removalJoin: String = "auto"): DataFrame = {
    val removal = sharedSpans(docs, idCol, textCol, k, minSpan, maxDf)
      .select(col("doc_b").as("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("span_words") - 1)).as("rmpos"))
      .distinct() // overlapping spans cover a position twice
      .groupBy(col("doc_id"))
      .agg(collect_set(col("rmpos")).as("__rm"))
    cutPositions(docs, idCol, textCol, removal, removalJoin)
  }

  /** Shared redaction tail: left-join the (doc_id, __rm positions[])
    * removal table onto the corpus and cut the listed 1-based word
    * positions in-row, reassembling survivors in order.
    *
    * `removalJoin` size-gates the join strategy:
    *  - "auto" (default): no hint — AQE's runtime statistics convert
    *    the join to broadcast when the materialized removal table is
    *    under `spark.sql.autoBroadcastJoinThreshold` and keep a
    *    doc_id-keyed shuffled join when it is corpus-proportional.
    *    This is the 100 TB-safe default: duplication incidence in raw
    *    crawls is 30–50% of docs, so the removal table can be
    *    corpus-sized and MUST be allowed to shuffle.
    *  - "broadcast": pin the broadcast (callers that KNOW the
    *    affected set is bounded, e.g. a capped hot-span pass).
    *  - "shuffle": pin a shuffled hash join (spec lane — proves the
    *    non-broadcast path bit-identical).
    * In every mode the text-side exchange, when one happens, is keyed
    * on doc_id only and carries each document once. */
  private[operators] def cutPositions(docs: DataFrame, idCol: String,
      textCol: String, removal: DataFrame,
      removalJoin: String): DataFrame = {
    val rm = removalJoin match {
      case "auto" => removal
      case "broadcast" => broadcast(removal)
      case "shuffle" => removal.hint("shuffle_hash")
      case other => throw new IllegalArgumentException(
        s"removalJoin=$other: expected auto | broadcast | shuffle")
    }
    docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .join(rm, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__rm").isNull, col("__w")).otherwise(
          filter(col("__w"), (_, i) =>
            !array_contains(col("__rm"), (i + 1).cast("long"))))
          .as("__kept"),
        size(col("__w")).as("__n"))
      .select(col("doc_id"),
        concat_ws(" ", col("__kept")).as("kept_text"),
        (col("__n") - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** HOT-span clusters — the df > maxDf class [[sharedSpans]]
    * deliberately caps away, treated in CLUSTER form so the most
    * duplicated content (license blocks, viral quotes, navigation
    * boilerplate — precisely what a substring-dedup pass most wants
    * to cut) is reported WITHOUT the df² pair fan-out the cap exists
    * to prevent.
    *
    * Pipeline: positioned shingle fps → census keeps fps in ≥ `minDf`
    * DISTINCT docs ("hot") → per-DOC gaps-and-islands over hot
    * positions (window partitioned by doc_id — doc-grained, never
    * single-partition) → each maximal run ≥ `minSpan` words carries a
    * SIGNATURE, the md5 of its ordered fp sequence, so byte-identical
    * runs across docs share a signature → runs group by signature into
    * clusters; the keeper is the (doc_id, start) smallest occurrence
    * (the [[exact]] keep-smallest-id discipline at span granularity).
    *
    * Cost is O(hot occurrences): one fp-keyed semi-join, one doc-keyed
    * window, one signature-keyed aggregate+window — no pair join
    * anywhere, so a span in 100k docs costs 100k rows, not 10^10
    * pairs. Conservative by construction: only positions whose
    * shingles are THEMSELVES hot join a run, so a run is a maximal
    * all-hot region; partially-overlapping variants form distinct
    * clusters (their fp sequences differ).
    *
    * Output: (span_sig, doc_id, start_pos, span_words, n_copies,
    * is_keeper) — one row per occurrence; `filter(!is_keeper)` is the
    * redaction set [[redactHotSpans]] consumes. */
  def hotSpanClusters(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, minDf: Int): DataFrame = {
    require(k >= 2 && minSpan >= k,
      s"minSpan=$minSpan / k=$k: need minSpan >= k >= 2")
    require(minDf >= 2, s"minDf=$minDf: a hot span needs >= 2 docs")
    val pos = positionedShingleFps(docs, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val hot = pos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("fp"))
    electSpanKeepers(hotSpanRuns(pos, hot, k, minSpan))
  }

  /** The stored-state half of [[hotSpanClusters]]: the corpus's run
    * LEDGER (doc_id, start_pos, span_words, span_sig) — what a
    * deployment persists next to the positioned index + census so
    * [[incrementalHotSpanClusters]] can reuse unaffected docs' runs
    * verbatim. Cluster sizes/keepers are deliberately NOT state: they
    * re-derive as a view ([[electSpanKeepers]]), the
    * templateHeaders/kmvLedger discipline. */
  def hotSpanLedger(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, minDf: Int): DataFrame = {
    val pos = positionedShingleFps(docs, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val hot = pos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("fp"))
    hotSpanRuns(pos, hot, k, minSpan)
  }

  /** Maximal all-hot runs per doc — the LEDGER half of
    * [[hotSpanClusters]] (the run rows are position-stable state a
    * deployment stores; cluster membership and keepers re-derive as a
    * VIEW via [[electSpanKeepers]]). `pos` is a positioned-fp frame
    * ([[positionedShingleFps]] shape), `hot` the qualifying fp set.
    * Output: (doc_id, start_pos, span_words, span_sig). */
  private def hotSpanRuns(pos: DataFrame, hot: DataFrame, k: Int,
      minSpan: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    pos.join(hot, Seq("fp"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_pos"),
        (count(lit(1)) + lit(k - 1).cast("long")).as("span_words"),
        // ordered fp sequence → portable signature (sort_array on the
        // (pos, fp) structs is the in-row order-by; fps join as plain
        // decimal strings so the oracle's string_agg matches byte-wise)
        md5(concat_ws(",",
          transform(sort_array(collect_list(struct(col("pos"), col("fp")))),
            s => s.getField("fp").cast("string")))).as("span_sig"))
      .filter(col("span_words") >= minSpan)
      .select(col("doc_id"), col("start_pos"), col("span_words"),
        col("span_sig"))
  }

  /** Cluster election VIEW over a run ledger: identical-signature runs
    * form a cluster, keeper = smallest (doc_id, start_pos). Windows
    * key by signature — cluster-grained, run-ledger-sized input. */
  private def electSpanKeepers(runs: DataFrame): DataFrame = {
    val bySig = org.apache.spark.sql.expressions.Window
      .partitionBy(col("span_sig"))
    val keeperOrder = org.apache.spark.sql.expressions.Window
      .partitionBy(col("span_sig"))
      .orderBy(col("doc_id"), col("start_pos"))
    runs
      .withColumn("n_copies", count(lit(1)).over(bySig))
      .withColumn("is_keeper", row_number().over(keeperOrder) === 1)
      .select(col("span_sig"), col("doc_id"), col("start_pos"),
        col("span_words"), col("n_copies"), col("is_keeper"))
  }

  /** O(changed) DAILY form of [[hotSpanClusters]]: absorb a new batch
    * against the stored positioned-fp index + per-fp census (the q156
    * shared state) and the stored RUN ledger, recomputing runs ONLY
    * for documents whose hot-position set can have changed — batch
    * docs, plus history docs containing a NEWLY-hot fingerprint.
    * Hotness is MONOTONE under an append-only corpus (df never
    * decreases), so a history doc with no newly-hot fp has an
    * identical hot-position set and its stored runs are reused
    * verbatim; cluster sizes and keepers re-derive as a view over the
    * merged ledger ([[electSpanKeepers]]), so a cluster that gains
    * copies — or exists only across the batch boundary — flips
    * correctly.
    *
    * Stored-side discipline: the batch fp set broadcasts into
    * semi-joins on the census (merged dfs for batch-present fps) and
    * the newly-hot fp set broadcasts into a semi-join on the stored
    * index (affected docs) — both BATCH-proportional, so the pin is
    * safe. Every join on the AFFECTED side (position pull-back,
    * present-fp census probe, kept-runs anti-join) is deliberately
    * unpinned: affected size tracks newly-hot INCIDENCE, which a
    * boilerplate-heavy batch can push toward corpus size, so AQE's
    * runtime stats pick broadcast vs shuffle per join (the
    * [[cutPositions]] "auto" discipline). History text is never
    * re-read. Oracle = the full [[hotSpanClusters]] recompute over
    * history ∪ batch. */
  def incrementalHotSpanClusters(historyIndex: DataFrame,
      historyCensus: DataFrame, storedRuns: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int, minSpan: Int,
      minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf=$minDf: a hot span needs >= 2 docs")
    val bpos = positionedShingleFps(batch, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val bCensus = bpos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("__dfb"))
      .transform(graft.util.CacheScope.persist)
    // merged df for batch-present fps; stored census semi-filtered by
    // the broadcast batch fp set, never shuffled whole
    val dfh = historyCensus
      .join(broadcast(bCensus.select(col("fp"))), Seq("fp"), "left_semi")
      .transform(graft.util.CacheScope.persist)
    val newlyHot = bCensus
      .join(dfh, Seq("fp"), "left")
      .select(col("fp"),
        (col("__dfb") + coalesce(col("df"), lit(0L))).as("__df"))
      .filter(col("__df") >= minDf)
      .join(dfh.filter(col("df") >= minDf).select(col("fp")),
        Seq("fp"), "left_anti") // was already hot → nothing changes
      .select(col("fp"))
      .transform(graft.util.CacheScope.persist)
    val affected = historyIndex
      .join(broadcast(newlyHot), Seq("fp"), "left_semi")
      .select(col("doc_id")).distinct()
      .transform(graft.util.CacheScope.persist)
    // Full position lists of every doc whose runs must recompute.
    // NONE of the joins on `affected` (or frames derived from it —
    // `pos`, `present`) carry a broadcast pin: all three scale with
    // newly-hot INCIDENCE, which a boilerplate-heavy batch can push
    // corpus-ward, so a pin is a driver-OOM in exactly the regime
    // this operator exists for. AQE's runtime stats size-gate each
    // one (the cutPositions "auto" discipline) — broadcast at the
    // common small-batch sizes, shuffle when incidence blows up.
    val pos = historyIndex
      .join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("pos"), col("fp"))
      .unionByName(bpos.select(col("doc_id"), col("pos"), col("fp")))
      .transform(graft.util.CacheScope.persist)
    // hotness for fps PRESENT in those docs: merged history+batch df.
    // `present` is position-set-proportional (distinct fps of the
    // affected ∪ batch docs) — same incidence axis, so the census
    // semi-join is unpinned too.
    val present = pos.select(col("fp")).distinct()
      .transform(graft.util.CacheScope.persist)
    val hot = present
      .join(historyCensus.join(present, Seq("fp"), "left_semi"),
        Seq("fp"), "left")
      .join(bCensus, Seq("fp"), "left")
      .select(col("fp"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__dfb"), lit(0L)))
          .as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("fp"))
    val recomputed = hotSpanRuns(pos, hot, k, minSpan)
    // kept-runs anti-join: the probe side (storedRuns) is the run
    // LEDGER, but the anti side is `affected` — incidence-
    // proportional, so no pin here either.
    val kept = storedRuns
      .join(affected, Seq("doc_id"), "left_anti")
    electSpanKeepers(kept.unionByName(recomputed))
  }

  /** TOTAL substring redaction — [[redactSharedSpans]]'s pair form and
    * [[redactHotSpans]]'s cluster form UNIONED into one keep-first
    * cut, so duplicated spans are removed whatever their document
    * frequency: rare spans (2 ≤ anchor df ≤ `maxDf`) resolve
    * pair-wise with keep-smallest-id, hot spans (df ≥ `minDf`,
    * typically maxDf + 1 so the two lanes tile the df axis) resolve
    * cluster-wise with one elected keeper — and a position flagged by
    * EITHER lane is cut exactly once (the removal sets union before
    * the single in-row cut). This is the pass a training-data
    * pipeline actually schedules: neither lane alone covers both the
    * long tail of pairwise near-copies and the viral/boilerplate head.
    *
    * Conservative by construction, inherited from both lanes: a span
    * whose shingles MIX rare and hot df values can split at the lane
    * boundary, and each fragment must clear `minSpan` on its own to
    * report (uniform-df spans — the overwhelmingly common case —
    * redact whole). Both analyses share one positioned-fingerprint
    * pass and census (CacheScope-persisted); the doc text still joins
    * the union removal table once, under the same size-gated
    * `removalJoin` contract as [[cutPositions]]. Output: (doc_id,
    * kept_text, n_removed) for every input doc. */
  def redactAllSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, maxDf: Int, minDf: Int,
      removalJoin: String = "auto"): DataFrame = {
    require(minDf > maxDf,
      s"minDf=$minDf must exceed maxDf=$maxDf: the pair lane owns " +
        "df <= maxDf, the cluster lane df >= minDf")
    val pos = positionedShingleFps(docs, idCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val census = pos.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .transform(graft.util.CacheScope.persist)
    // pair lane (the sharedSpans chain over the shared pos/census)
    val anchors = census
      .filter(col("df") >= 2 && col("df") <= maxDf).select(col("fp"))
    val qual = pos.join(anchors, Seq("fp"))
    val pairRm = spansFromMatches(
        qual.as("a").join(qual.as("b"),
            col("a.fp") === col("b.fp") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.pos").as("pos_a"), col("b.pos").as("pos_b")),
        k, minSpan)
      .select(col("doc_b").as("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("span_words") - 1)).as("rmpos"))
    // cluster lane (the hotSpanClusters chain over the same state)
    val hotRm = electSpanKeepers(
        hotSpanRuns(pos, census.filter(col("df") >= minDf).select(col("fp")),
          k, minSpan))
      .filter(!col("is_keeper"))
      .select(col("doc_id"),
        explode(sequence(col("start_pos"),
          col("start_pos") + col("span_words") - 1)).as("rmpos"))
    val removal = pairRm.unionByName(hotRm)
      .distinct() // overlapping spans and cross-lane overlap collapse
      .groupBy(col("doc_id"))
      .agg(collect_set(col("rmpos")).as("__rm"))
    cutPositions(docs, idCol, textCol, removal, removalJoin)
  }

  /** Keep-first redaction of HOT spans: every non-keeper occurrence
    * from [[hotSpanClusters]] is cut from its document; the keeper
    * copy survives intact — closing the redaction gap where
    * [[redactSharedSpans]]'s pair form is structurally blind (df >
    * maxDf content produces no pair rows there).
    *
    * The removal table here is one row per non-keeper OCCURRENCE —
    * O(hot occurrences), which at crawl scale is still potentially
    * corpus-proportional, so the join takes the same size-gated
    * `removalJoin` contract as [[cutPositions]] (default "auto": AQE
    * decides broadcast vs doc_id-keyed shuffle at runtime). Output:
    * (doc_id, kept_text, n_removed) for EVERY input doc. */
  def redactHotSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int, minDf: Int,
      removalJoin: String = "auto"): DataFrame = {
    val removal = hotSpanClusters(docs, idCol, textCol, k, minSpan, minDf)
      .filter(!col("is_keeper"))
      .select(col("doc_id"),
        explode(sequence(col("start_pos"),
          col("start_pos") + col("span_words") - 1)).as("rmpos"))
      .distinct() // runs never overlap within a doc, but stay defensive
      .groupBy(col("doc_id"))
      .agg(collect_set(col("rmpos")).as("__rm"))
    cutPositions(docs, idCol, textCol, removal, removalJoin)
  }
}
