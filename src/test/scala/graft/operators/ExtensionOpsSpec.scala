package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again"),
      (2L, "  the   QUICK brown fox JUMPS over the lazy dog again and again "),
      (3L, "a completely different document about spark query engines here"),
      (4L, "The quick brown fox jumps over the lazy dog again and once more"))
      .toDF("doc_id", "text")
  }

  test("exact dedup collapses case/whitespace variants") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getLong(2) == 2).get
    assert(dup.getLong(1) == 1L) // keep_id = min(1, 2)
  }

  test("minhash-LSH proposes the near-dup pair, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical after normalization
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("incremental minhash flags new-vs-history matches only, never new-vs-new") {
    val s = spark
    import s.implicits._
    // history: doc 10; new batch: 11 (identical to 10), 13 (identical
    // to 11 — a NEW×NEW pair that must NOT be flagged), 12 (unrelated)
    val history = Seq(
      (10L, "The quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again"),
      (13L, "THE QUICK brown fox jumps over the lazy dog again and again"),
      (12L, "a completely different document about spark query engines here"))
      .toDF("doc_id", "text")
    val histSigs = Dedup.minhashSignaturesNative(
      history, "doc_id", "text", shingleK = 3, numHashes = 6)
    val out = Dedup.incrementalMinhash(histSigs, newBatch, "doc_id", "text",
        shingleK = 3, numHashes = 6, rowsPerBand = 2, minMatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // both normalized-identical new docs match history doc 10 with a
    // full 6/6 signature; the unrelated doc and the new x new pair
    // (11, 13) are absent
    assert(out.toSet == Set((11L, 10L, 6L), (13L, 10L, 6L)), out.toSeq)
  }

  test("incremental simhash ≡ batch pairs restricted to new×history") {
    val s = spark
    import s.implicits._
    // history: 10 (base text), 14 (unrelated); batch: 11 and 13
    // normalized-identical to 10 (hamming 0 — guaranteed flagged at
    // any threshold; also a NEW×NEW identical pair that must NOT be
    // emitted), 12 (unrelated to everything)
    val history = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (14L, "completely disjoint vocabulary nothing shared with anything else"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again today"),
      (13L, "THE QUICK brown fox jumps over the lazy dog again and again today"),
      (12L, "spark catalyst tungsten planner rules strategies exchanges"))
      .toDF("doc_id", "text")
    val histSigs = Dedup.simhash32Native(history, "doc_id", "text", 3)
    val inc = Dedup.incrementalSimhash(histSigs, batch, "doc_id", "text",
        shingleK = 3, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // equivalence: the batch self-join over history ∪ batch, restricted
    // to pairs that CROSS the split, proposes and verifies through the
    // identical pigeonhole bands — the incremental path must match it
    // exactly (pure optimization, not an approximation)
    val histIds = Set(10L, 14L)
    val full = Dedup.simhashPairs(
        Dedup.simhash32Native(history.unionByName(batch), "doc_id", "text", 3),
        maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect {
        case (a, b) if histIds(a) && !histIds(b) => (b, a)
        case (a, b) if !histIds(a) && histIds(b) => (a, b)
      }.toSet
    assert(inc == full, s"incremental ≠ batch-cross:\n inc=$inc\n full=$full")
    // behavior: identical-to-history docs flagged at hamming 0; the
    // NEW×NEW identical pair (11,13) is structurally absent
    assert(inc.contains((11L, 10L)) && inc.contains((13L, 10L)), inc)
    assert(!inc.contains((13L, 11L)) && !inc.contains((11L, 13L)), inc)
  }

  test("winnow selection ≡ per-window rightmost-argmin reference (ties, short docs, repeats)") {
    // Pins the r18 probe-based selection (prev-strictly-smaller /
    // next-smaller-or-equal window-existence test) against the
    // original materialize-every-window form it replaced, on inputs
    // chosen to stress every edge: in-doc repeated shingles (hash
    // TIES — rightmost must win), docs shorter than the window
    // (global-min degenerate case), docs exactly at the window size,
    // and a deterministic pseudo-random corpus.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(421)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    val gen = (n: Int) => (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val docs = (
      Seq(
        (1L, "x y z x y z x y z x y z"),          // pure repetition: maximal ties
        (2L, "one two three"),                     // m = 1 shingle (k=3)
        (3L, "one two three four"),                // m = 2 < w
        (4L, "one two three four five six"),       // m = w exactly
        (5L, "p q r p q r s p q r p q r"),         // repeats + break
        (6L, "just two")                           // too short: no shingle
      ) ++ (7L to 40L).map(i => (i, gen(3 + rnd.nextInt(30))))
    ).toDF("doc_id", "text")
    for (w <- Seq(1, 2, 4, 7)) {
      val got = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // reference: the pre-r18 expression — every window's rightmost
      // argmin via aggregate, deduped
      val ref = docs
        .select(col("doc_id"), Dedup.words(col("text")).as("__w"))
        .filter(size(col("__w")) >= 3)
        .withColumn("__sh", Dedup.wordShingles(col("__w"), 3))
        .select(col("doc_id"), expr(
          "transform(__sh, x -> " +
            "CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT))")
          .as("__kh"))
        .withColumn("__sel", expr(s"""
          array_distinct(transform(
            sequence(1, greatest(size(__kh) - $w + 1, 1)), j ->
              aggregate(
                sequence(j, least(j + $w - 1, size(__kh))),
                named_struct('h', CAST(9223372036854775807 AS BIGINT),
                             'p', 0),
                (acc, p) -> IF(element_at(__kh, p) <= acc.h,
                  named_struct('h', element_at(__kh, p), 'p', p),
                  acc))))"""))
        .select(col("doc_id"), explode(col("__sel")).as("s"))
        .select(col("doc_id"), col("s.p").cast("long").as("pos"),
          col("s.h").as("fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == ref,
        s"w=$w: probe selection ≠ window-argmin reference\n" +
          s" only-new=${got -- ref}\n only-ref=${ref -- got}")
    }
  }

  test("winnowing: subset of the shingle index, sparser, guarantee holds") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four $shared nine ten eleven twelve thirteen"),
      (2L, s"red green blue cyan $shared pink brown black white grey"),
      (3L, "totally different words everywhere nothing matches here at all"))
      .toDF("doc_id", "text")
    val k = 3; val w = 4
    val win = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = Dedup.positionedShingleFps(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // selected fingerprints are a strict, sparser subset of the index
    assert(win.toSet.subsetOf(all.toSet), "winnowed ∉ shingle index")
    assert(win.length < all.length, "winnowing must shrink the index")
    // the winnowing guarantee: docs 1 and 2 share an 8-word run
    // (≥ w + k - 1 = 6), so they must share a selected fingerprint
    val f1 = win.collect { case (1L, _, fp) => fp }.toSet
    val f2 = win.collect { case (2L, _, fp) => fp }.toSet
    assert((f1 intersect f2).nonEmpty, "shared run lost by winnowing")
    // a doc shorter than the window still yields fingerprints
    val tiny = Dedup.winnowFingerprints(
      Seq((9L, "just three words")).toDF("doc_id", "text"), "doc_id",
      "text", k, w).count()
    assert(tiny == 1L, "short doc must keep its global-min fingerprint")
    // end-to-end: the candidate-pair join over the winnowed index
    // surfaces exactly the overlapping pair, never the unrelated doc
    val cand = Dedup.winnowCandidatePairs(docs, "doc_id", "text", k, w,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((1L, 2L)), s"candidates: $cand")
  }

  test("incremental dup clusters ≡ full recompute: merge, singleton pickup, untouched passthrough") {
    val s = spark
    import s.implicits._
    // identical texts share every band → these edges are
    // deterministic: batch docs extend history clusters (10 → {1,2},
    // 11 → {3,4}), wake an in-history singleton (12 → 5), or stay
    // edgeless and absent (13). Old-cluster MERGES need partially-
    // overlapping texts (probabilistic banding) — the variant sweep
    // below covers that lane through the inc ≡ full equivalence.
    val history = Seq(
      (1L, "copy a copy a copy a"), (2L, "copy a copy a copy a"),
      (3L, "copy b copy b copy b"), (4L, "copy b copy b copy b"),
      (5L, "solo text entirely alone here"),
      (6L, "another unrelated document body")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "copy a copy a copy a"),
      (11L, "copy b copy b copy b"),
      (12L, "solo text entirely alone here"),
      (13L, "fresh unseen words nothing shares")
    ).toDF("doc_id", "text")
    val histSigs = Dedup.minhashSignaturesNative(history, "doc_id", "text", 3, 6)
    val ledger = Dedup.dupClusters(
      Dedup.minhashLsh(history, "doc_id", "text", 3, 6, 2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = rows(Dedup.incrementalDupClusters(ledger, histSigs, batch,
      "doc_id", "text", 3, 6, 2))
    val full = rows(Dedup.dupClusters(
      Dedup.minhashLsh(history.unionByName(batch), "doc_id", "text", 3, 6, 2)))
    assert(inc == full, s"incremental ≠ full:\n inc=$inc\n full=$full")
    // shape spot-checks: cluster {1,2,10} keeps id 1 size 3; {3,4,11}
    // keeps 3 size 3; singleton 5 wakes into {5,12}; 6 and 13 absent
    val byDoc = inc.map(r => r._1 -> r).toMap
    assert(byDoc(10L) == ((10L, 1L, 3L)))
    assert(byDoc(11L) == ((11L, 3L, 3L)))
    assert(byDoc(5L) == ((5L, 5L, 2L)) && byDoc(12L) == ((12L, 5L, 2L)))
    assert(!byDoc.contains(6L) && !byDoc.contains(13L))
    // variant sweep: near-dup texts (shared prefix, small suffix
    // edits) band-collide deterministically-but-unpredictably, so
    // whatever edges arise — including batch docs bridging two old
    // clusters into a merge — the contraction must still equal the
    // full recompute
    val pool = Seq(
      "alpha beta gamma delta epsilon zeta eta",
      "alpha beta gamma delta epsilon zeta theta",
      "alpha beta gamma delta epsilon iota kappa",
      "lambda mu nu xi omicron pi rho",
      "lambda mu nu xi omicron pi sigma",
      "completely different trailing words here now")
    val all2 = (0 until 24).map(i => (i.toLong, pool(i % pool.length)))
    val hist2 = all2.filter(_._1 % 3 > 0).toDF("doc_id", "text")
    val batch2 = all2.filter(_._1 % 3 == 0).toDF("doc_id", "text")
    val inc2 = rows(Dedup.incrementalDupClusters(
      Dedup.dupClusters(Dedup.minhashLsh(hist2, "doc_id", "text", 3, 6, 2)),
      Dedup.minhashSignaturesNative(hist2, "doc_id", "text", 3, 6),
      batch2, "doc_id", "text", 3, 6, 2))
    val full2 = rows(Dedup.dupClusters(Dedup.minhashLsh(
      hist2.unionByName(batch2), "doc_id", "text", 3, 6, 2)))
    assert(inc2 == full2, s"variant sweep: inc=$inc2\nfull=$full2")
  }

  test("minhash calibration: candidates share ≥ rowsPerBand components, estimator sane") {
    val sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Dedup.minhashCalibration(sf, "doc_id", "text",
        shingleK = 3, numHashes = 6, rowsPerBand = 2, tolCenti = 50)
      .collect()
      .map(r => (r.getAs[Double]("jaccard"), r.getAs[Long]("n_match"),
        r.getAs[Boolean]("est_ok")))
    assert(rows.nonEmpty)
    rows.foreach { case (j, m, ok) =>
      // an LSH candidate collided on some band, so that band's
      // rowsPerBand signature components must agree
      assert(m >= 2L && m <= 6L, s"n_match $m outside [2,6]")
      assert(j >= 0.0 && j <= 1.0)
      assert(ok == (math.abs(m / 6.0 - j) <= 0.5), "flag must restate the bound")
    }
    // the estimator tracks the exact value on average — the property
    // the q108 minMatches admission threshold relies on
    val meanErr = rows.map { case (j, m, _) =>
      math.abs(m / 6.0 - j) }.sum / rows.length
    assert(meanErr <= 0.35, s"mean |est - jaccard| = $meanErr")
  }

  test("containment flags a small doc embedded in a large one; jaccard alone misses it") {
    val s = spark
    import s.implicits._
    // filler chosen (offline, same md5 hash family) so the embedded
    // pair still collides on a band — the scaladoc caveat is real:
    // extreme padding ratios fall OUT of the Jaccard-tuned candidate
    // set, so the crafted pair keeps jaccard just under the 0.5 flag
    // line while staying proposable
    val small = "the quick brown fox jumps over the lazy dog"
    val filler = (0 to 7).map(i => s"pad10w$i").mkString(" ")
    val corpus = Seq(
      (1L, small),
      (2L, small + " " + filler), // small fully embedded, j ≈ 0.47
      (3L, "a completely unrelated document about query engines"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, "doc_id", "text",
        shingleK = 3, numHashes = 6, rowsPerBand = 2,
        minContainmentCenti = 80, maxJaccardCenti = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("jaccard"), r.getAs[Double]("containment"),
          r.getAs[Boolean]("partial_copy"))).toMap
    val (j, c, flag) = out.getOrElse((1L, 2L),
      fail(s"embedded pair not proposed by LSH: ${out.keySet}"))
    assert(c == 1.0, s"full embedding must give containment 1.0, got $c")
    assert(j < 0.5, s"jaccard must stay low under 10x padding, got $j")
    assert(flag, "partial_copy must fire on high-containment low-jaccard")
  }

  test("jaccard verification: identical docs = 1.0, overlap in (0,1)") {
    val cand = {
      val s = spark
      import s.implicits._
      Seq((1L, 2L), (1L, 4L), (1L, 3L)).toDF("doc_a", "doc_b")
    }
    val j = Dedup.ngramJaccardForPairs(docs, cand, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) > 0.4 && j((1L, 4L)) < 1.0)
    assert(!j.contains((1L, 3L))) // zero shared shingles -> no row
  }

  test("simhash: normalized-identical docs have Hamming distance 0") {
    val sigs = Dedup.simhash32(
      Dedup.explodedShingles(docs, "doc_id", "text", 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("native in-row signatures equal the aggregate forms") {
    val viaAgg = Dedup.simhash32(
      Dedup.explodedShingles(docs, "doc_id", "text", 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = Dedup.simhash32Native(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
    val minAgg = Dedup.minhashSignatures(
      Dedup.explodedShingles(docs, "doc_id", "text", 3), numHashes = 6)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getLong)).toMap
    val minExpr = Dedup.minhashSignaturesNative(docs, "doc_id", "text", 3, 6)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getLong)).toMap
    assert(minExpr == minAgg)
  }
}

class SimilaritySpec extends SparkSpec {
  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // near 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks the obvious neighbor first") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect()
    assert(top.head.getLong(1) == 1L) // nearest
    assert(top.head.getDouble(2) > 0.99)
    assert(top.last.getLong(1) == 3L) // opposite vector ranks last
  }

  test("hard negatives: positives and self excluded, ranks stay dense") {
    val s = spark
    import s.implicits._
    // without exclusions, vec 0's ranking is 1, 2, 3 (see the brute-force
    // test); labeling 1 positive must PROMOTE 2 and 3 — not leave holes
    val positives = Seq((0L, 1L)).toDF("q_id", "pos_id")
    val out = Similarity.hardNegatives(vecs, positives,
        "vec_id", "embedding", k = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(out == Seq((2L, 1), (3L, 2)),
      "positive must drop out before ranking; survivors re-rank densely")
    // a positive that matches nothing degenerates to plain brute force
    val viaEmpty = Similarity.hardNegatives(
      vecs, Seq((0L, 99L)).toDF("q_id", "pos_id"), // non-existent positive
      "vec_id", "embedding", k = 3)
    val plain = Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
    assert(viaEmpty.orderBy("rnk").collect().map(_.getLong(1)).toSeq ==
      plain.orderBy("rnk").collect().map(_.getLong(1)).toSeq)
  }

  test("LSH hard negatives: recall >= 0.6 vs exact q118 form, exclusions hold") {
    val s = spark
    import s.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // panel of 10 queries, each with one labeled positive
    val positives = (0L until 10L).map(q => (q, q + 50L)).toDF("q_id", "pos_id")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.hardNegatives(e, positives,
      "vec_id", "embedding", k = 5))
    val approx = Similarity.hardNegativesLsh(e, positives,
      "vec_id", "embedding", k = 5, numTables = 6, planesPerTable = 6,
      dims = 64)
    val got = pairs(approx)
    // the q21 discipline: approximate candidates, exact tail — recall
    // pinned against the exact registered form
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 $recall (${(exact & got).size}/${exact.size})")
    // exclusions survive the candidate-source swap: no self, no positive
    val posSet = positives.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (q, n) => q != n && !posSet((q, n)) })
    // scale shape: bucket equi-joins only, no all-pairs scan
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH hard negatives must not plan an all-pairs join:\n$plan")
  }

  test("identical vectors share every LSH bucket") {
    val s = spark
    import s.implicits._
    val dup = Seq((0L, Array(0.3f, -0.2f, 0.9f, 0.1f)),
      (1L, Array(0.3f, -0.2f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(dup, "vec_id", "embedding",
        numTables = 2, planesPerTable = 4, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(b((0L, 0L)) == b((1L, 0L)) && b((0L, 1L)) == b((1L, 1L)))
  }

  test("multi-probe LSH top-5 recall >= 0.6 vs exact baseline") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("q_id", "n_id"))
    val approx = pairs(Similarity.lshTopK(e, q, "vec_id", "embedding", 5,
        numTables = 6, planesPerTable = 6, dims = 64, multiProbe = true)
      .select("q_id", "n_id"))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 $recall")
  }

  test("matryoshka: exact at full dims, recall pinned at 32/50, no vectors past the coarse window") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("q_id", "n_id"))
    // dims = full dimension, shortlist = corpus → the funnel must be a
    // no-op: identical to the exact top-k, ranks and cosines included
    val full = Similarity.matryoshkaTopK(e, q, "vec_id", "embedding",
      dims = 64, shortlist = 1000, k = 5)
    assert(pairs(full.select("q_id", "n_id")) == exact)
    // truncated funnel: recall degrades but must stay usable (the
    // gate's 32/50 cut measures ~0.75 on this noise-like corpus)
    val trunc = pairs(Similarity.matryoshkaTopK(e, q, "vec_id", "embedding",
      dims = 32, shortlist = 50, k = 5).select("q_id", "n_id"))
    val recall = (exact & trunc).size.toDouble / exact.size
    assert(recall >= 0.6, s"matryoshka recall@5 $recall")
    // the coarse window's exchange must not carry any vector column —
    // column pruning has to drop the truncated vectors once tcos is
    // computed, or the funnel shuffles what it exists to avoid
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = Similarity.matryoshkaTopK(e, q, "vec_id", "embedding",
      32, 50, 5).queryExecution.optimizedPlan
    val coarse = lp.collect {
      case w: LWindow if w.windowExpressions.exists(_.name == "trk") => w
    }
    assert(coarse.nonEmpty, "coarse window not found in optimized plan")
    coarse.foreach { w =>
      val carried = w.child.output.map(_.name).filter(_.contains("vec"))
      assert(carried.isEmpty, s"coarse window carries vectors: $carried")
    }
  }

  test("bucketed near-dup: subset of exact, recall >= 0.6, no cartesian") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.nearDupPairsBucketed(e, "vec_id", "embedding",
      0.4, numTables = 8, planesPerTable = 4, dims = 64)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed near-dup must not plan an all-pairs join:\n$plan")
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact)) // exact rerank -> precision 1.0
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall (${got.size}/${exact.size})")
  }

  test("diversity sample: per-bucket quota, partition-invariant, no global sort") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sample = Similarity.diversitySample(e, "vec_id", "embedding",
      planesPerTable = 4, dims = 64, perBucket = 10)
    val rows = sample.collect()
    val perBucket = rows.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(perBucket.values.forall(_ <= 10), perBucket.toMap.toString)
    assert(rows.map(_.getInt(2)).forall(r => r >= 1 && r <= 10))
    // deterministic under re-partitioning: same subset from a 17-way
    // repartitioned input
    val again = Similarity.diversitySample(e.repartition(17), "vec_id",
        "embedding", planesPerTable = 4, dims = 64, perBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again ==
      rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
    // the quota must prune below the sort (WindowGroupLimit), never a
    // corpus-wide ordering
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}

class TextAnalysisSpec extends SparkSpec {
  test("incremental bigram census ≡ full recompute, for any split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = TextAnalysis.bigramCensus(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    Seq(2L, 3L, 7L).foreach { mod =>
      val history = docs.filter(col("doc_id") % mod > 0)
      val batch = docs.filter(col("doc_id") % mod === 0)
      val inc = TextAnalysis.incrementalBigramCensus(
          TextAnalysis.bigramCensus(history, "doc_id", "text"),
          batch, "doc_id", "text")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(inc == full, s"mod=$mod census diverged")
    }
    // brand-new bigrams append; counts add on shared ones
    val s = spark
    import s.implicits._
    val stored = TextAnalysis.bigramCensus(
      Seq((1L, "a b a b")).toDF("doc_id", "text"), "doc_id", "text")
    val out = TextAnalysis.incrementalBigramCensus(stored,
        Seq((2L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "d") -> 1L))
  }

  test("top tokens per group: dense ranks, non-increasing counts, exact on a crafted corpus") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("en", "a a a b b c"),
      ("en", "b d"),
      ("de", "x y x"))
      .toDF("lang", "text")
    val top = TextAnalysis.topTokensPerGroup(df, "lang", "text", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    // en: a=3, b=3 → tie broken by token asc; de: x=2, y=1
    assert(top.toSeq == Seq(
      ("de", "x", 2L, 1), ("de", "y", 1L, 2),
      ("en", "a", 3L, 1), ("en", "b", 3L, 2)))
  }

  test("occurrence counting and language prediction") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat and the dog sat in the garden of the house"),
      (2L, "der hund und die katze das ist nicht der fall und das war es"),
      (3L, "xyzzy plugh"),
      (4L, "the the the")) // adjacent repeats must each count
      .toDF("doc_id", "text")
      .withColumn("__w", Dedup.words(col("text")))
    val scores = TextAnalysis.stopwords.keys.map(l =>
      l -> TextAnalysis.stopwordScore(col("__w"), l)).toMap
    val out = df.select(col("doc_id"),
        TextAnalysis.predictedLanguage(scores).as("pred"),
        TextAnalysis.wordCount(col("__w"), "the").as("n_the"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("en", 4L))
    assert(out(2L)._1 == "de")
    assert(out(3L)._1 == "und")
    assert(out(4L) == ("en", 3L)) // the replace-based version counted 2
  }

  test("quality score stays in [0,1]; token counts are exact") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "one two  three"), (2L, ""), (3L, "12345 67890!!!"))
      .toDF("doc_id", "text")
      .withColumn("__w", Dedup.words(col("text")))
    val out = df.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.bpeTokenEstimate(col("text")).as("bpe"),
        TextAnalysis.qualityScore(col("text"), col("__w")).as("q")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 3L && out(1L)._2 == 3L) // 11 non-space chars -> ceil(11/4)=3
    assert(out(2L)._1 == 0L)
    out.values.foreach { case (_, _, q) => assert(q >= 0.0 && q <= 1.0) }
  }
}

class MultimodalSpec extends SparkSpec {
  test("stub decoder computes byte statistics partition-wise") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc 123 XYZ")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(spark, df, "doc_id", "text").head()
    assert(f.n_bytes == 11L && f.n_lower == 3L && f.n_space == 2L &&
      f.n_digit == 3L)
    assert(f.byte_sum_mod == "abc 123 XYZ".getBytes("UTF-8")
      .map(_ & 0xff).map(_.toLong).sum % 997)
  }

  test("frame sampling slices the payload into fixed-size frames") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "0123456789")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.withPayload(df, "doc_id", "text"), "doc_id",
        frameSize = 4, stride = 1)
      .orderBy("frame_idx").collect()
    assert(frames.length == 3)
    assert(new String(frames(0).getAs[Array[Byte]]("frame")) == "0123")
    assert(new String(frames(2).getAs[Array[Byte]]("frame")) == "89")
    assert(frames.map(_.getLong(2)).sum == 10L)
  }

  test("frame sampling: empty payload emits NO phantom frame; stride filters") {
    val s = spark
    import s.implicits._
    // the sf corpora contain no empty docs, so this branch is covered
    // here: a clamped sequence bound would emit one 0-byte frame for
    // the empty payload — the operator's array() case must not
    val df = Seq((1L, ""), (2L, "abcdefgh")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.withPayload(df, "doc_id", "text"), "doc_id",
        frameSize = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(!frames.exists(_._1 == 1L), "empty payload produced a frame")
    // doc 2: frames 0,1,2 exist; stride 2 keeps 0 and 2
    assert(frames.filter(_._1 == 2L).map(_._2).sorted == Seq(0, 2))
  }

  test("media census complements the dup census on bytes") {
    // kept_bytes + dup_bytes must tile each doc's total frame mass —
    // the two census views (audit: what dedup RECLAIMS; curation:
    // what a store PAYS FOR) are complements by construction
    val dir = "/root/testdata/sf0.001"
    val flagged = Multimodal.dedupFrames(
      Multimodal.sampleFrames(
        Multimodal.withPayload(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
        "doc_id", frameSize = 64, stride = 1), "doc_id")
    val total = flagged.groupBy("doc_id")
      .agg(sum(col("frame_bytes")).as("tb"))
    val bad = Multimodal.mediaCurationCensus(flagged, "doc_id")
      .join(Multimodal.frameDupCensus(flagged, "doc_id")
        .select(col("doc_id"), col("dup_bytes")), Seq("doc_id"))
      .join(total, Seq("doc_id"))
      .filter(col("kept_bytes") + col("dup_bytes") =!= col("tb"))
    assert(bad.isEmpty, "kept + dup bytes did not tile the frame mass")
  }

  test("frame ledger: min-merge over an arbitrary cut ≡ full recompute") {
    // the q213 exactness claim: (first_doc, first_idx) is a least-
    // semilattice and n_occ is additive, so ANY 2-cut of the corpus
    // merges to the same ledger the full pass builds
    val dir = "/root/testdata/sf0.001"
    def framesOf(p: org.apache.spark.sql.Column) = Multimodal.sampleFrames(
      Multimodal.withPayload(
        spark.read.parquet(s"$dir/documents.parquet").filter(p),
        "doc_id", "text"),
      "doc_id", frameSize = 64, stride = 1)
    val merged = Multimodal.mergeFrameLedger(
        Multimodal.frameLedger(framesOf(col("doc_id") % 7 < 3), "doc_id"),
        Multimodal.frameLedger(framesOf(col("doc_id") % 7 >= 3), "doc_id"))
      .orderBy("frame_digest").collect().toSeq
    val full = Multimodal.frameLedger(framesOf(lit(true)), "doc_id")
      .orderBy("frame_digest").collect().toSeq
    assert(merged == full, "cut-merged ledger diverged from full pass")
    assert(full.nonEmpty)
  }

  test("frame-ledger purge ≡ recompute over survivors; evicted winners re-elect") {
    val dir = "/root/testdata/sf0.001"
    def frames(p: org.apache.spark.sql.Column) = Multimodal.sampleFrames(
      Multimodal.withPayload(
        spark.read.parquet(s"$dir/documents.parquet").filter(p),
        "doc_id", "text"),
      "doc_id", frameSize = 64, stride = 1)
    val all = frames(lit(true))
    val purged = Multimodal.purgeFrameLedger(
        Multimodal.frameLedger(all, "doc_id"),
        Multimodal.frameOccurrences(all, "doc_id"),
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 5 === 0).select(col("doc_id")),
        "doc_id")
      .orderBy("frame_digest").collect().toSeq
    val full = Multimodal.frameLedger(frames(col("doc_id") % 5 =!= 0),
      "doc_id").orderBy("frame_digest").collect().toSeq
    assert(purged == full, "purged ledger diverged from survivor recompute")

    // micro-case: the first occurrence is IN the deleted doc — the
    // runner-up must win the re-election; a digest whose every
    // occurrence dies must vanish
    val s = spark
    import s.implicits._
    val shared = "z" * 64
    val tiny = Seq((1L, shared), (4L, shared), (1L, "")).toDF("doc_id", "text")
      .filter(col("text") =!= "")
    val tf = Multimodal.sampleFrames(
      Multimodal.withPayload(tiny, "doc_id", "text"), "doc_id", 64, 1)
    val after = Multimodal.purgeFrameLedger(
        Multimodal.frameLedger(tf, "doc_id"),
        Multimodal.frameOccurrences(tf, "doc_id"),
        Seq(1L).toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(after.length == 1 && after.head._2 == 4L && after.head._3 == 1L,
      s"re-election wrong: ${after.toSeq}")
  }

  test("ledger census pins ARRIVAL-order keep-first, not id order") {
    val s = spark
    import s.implicits._
    // the semantic line between q210 (whole-corpus (doc, idx)
    // election) and q214 (the ledgered copy wins): the ledger holds a
    // frame first seen in doc 5; the day's doc 0 re-sends the same
    // 64 bytes with a SMALLER id. A batch election would crown doc 0;
    // the incremental census must call it a retread — the stored copy
    // is already paid for.
    val sharedText = "x" * 64
    val ledger = Multimodal.frameLedger(
      Multimodal.sampleFrames(
        Multimodal.withPayload(Seq((5L, sharedText)).toDF("doc_id", "text"),
          "doc_id", "text"),
        "doc_id", frameSize = 64, stride = 1), "doc_id")
    val day = Multimodal.sampleFrames(
      Multimodal.withPayload(
        Seq((0L, sharedText + ("y" * 64)), (2L, "y" * 64))
          .toDF("doc_id", "text"),
        "doc_id", "text"),
      "doc_id", frameSize = 64, stride = 1)
    val verdicts = Multimodal.dedupFramesAgainstLedger(ledger, day, "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("frame_idx"), r.getAs[Boolean]("keep"))).toSet
    assert(verdicts == Set(
      (0L, 0, false), // ledgered in doc 5 — retread despite id 0 < 5
      (0L, 1, true),  // novel digest, day-internal first occurrence
      (2L, 0, false)  // same novel digest, later (doc, idx) — retread
    ), s"arrival-order verdicts wrong: $verdicts")
  }
}

class StreamingOpsSpec extends SparkSpec {
  import graft.streaming.StreamingOps

  test("streaming novelty gate: known text blocked, novel passes, normalization collapses") {
    val s = spark
    import s.implicits._
    // doc_id % 3 > 0 is history, % 3 = 0 streams in. Doc 3's text is a
    // case/whitespace VARIANT of history doc 1's — the normalized
    // fingerprint must block it; 6 is novel; 9 repeats 6's text inside
    // the stream (both pass — intra-stream dedup is deliberately not
    // part of the gate, see the operator doc).
    val dir = tmpDir("novelty")
    Seq(
      (1L, "shared history text body here"),
      (2L, "other history document content"),
      (3L, "  SHARED history   text body HERE "),
      (6L, "a genuinely novel arrival"),
      (9L, "a genuinely novel arrival"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    val part = new java.io.File(s"$dir/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val out = StreamingOps.streamNovelDocs(spark, dir, "novelty_spec_sink")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(6L, 9L),
      s"variant of history must be blocked, novel arrivals pass: $out")
    // first-arrival form: docs 6 and 9 carry the SAME novel text, so
    // the fingerprint-keyed stream dedup collapses them to one emission
    val fa = StreamingOps.streamNovelFirstArrival(spark, dir,
        "novelty_fa_spec_sink")
      .collect().map(_.getString(0)).toSeq
    assert(fa.length == 1 && fa.distinct.length == 1,
      s"same-fp arrivals must collapse to one novel emission: $fa")
  }

  test("corpus health stream: windowed per-source stats equal the batch recompute") {
    val s = spark
    import s.implicits._
    // ids 0,1,59 land in the first 60 s window, 61 in the second;
    // doc 1 is whitespace-only (counts as empty, zero tokens)
    val dir = tmpDir("health")
    Seq(
      (0L, "one two three", "a"), (1L, "   ", "a"),
      (59L, "x y", "b"), (61L, "z", "b"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    val part = new java.io.File(s"$dir/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val out = StreamingOps.corpusHealthStream(spark, dir, "health_spec_sink")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val w0 = 1704067200000L
    assert(out == Set(
      (w0, "a", 2L, 3L, 16L, 1L),
      (w0, "b", 1L, 2L, 3L, 0L),
      (w0 + 60000L, "b", 1L, 1L, 1L, 0L)),
      s"windowed stats drifted: $out")
  }

  test("novelty gate micro-batch plan: stream side never shuffles before the anti join") {
    val s = spark
    import s.implicits._
    // the q145 composition under a MemoryStream, audited at the
    // MICRO-BATCH plan level (batch-side plan audits can't see inside a
    // stream): the arriving slice must reach the history anti join
    // map-side — no ShuffleExchange with the streaming scan below it.
    // The static side may shuffle inside its own broadcast subtree
    // (history distinct); that is O(ledger build), not O(stream).
    val historyFps = Seq(Tuple1("old doc"), Tuple1("other doc")).toDF("t")
      .select(Dedup.fingerprint(col("t")).as("fp"))
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](44, spark, None)
    val novel = input.toDF().toDF("doc_id", "text")
      .withColumn("fp", Dedup.fingerprint(col("text")))
      .join(historyFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
    val q = novel.writeStream.format("memory").queryName("novelty_plan_sink")
      .outputMode("append").start()
    val plan = try {
      input.addData((1L, "fresh alpha"), (2L, "old doc"))
      q.processAllAvailable()
      org.apache.spark.sql.graft.Bridge.lastMicroBatchPlan(q)
        .getOrElse(fail("no completed micro-batch"))
    } finally q.stop()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.datasources.v2.MicroBatchScanExec
    // descend through AQE wrappers — collect() stops at their frontier
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    def subtreeHasStreamScan(p: SparkPlan): Boolean =
      nodes(p).exists(_.isInstanceOf[MicroBatchScanExec])
    val offenders = nodes(plan).collect {
      case e: ShuffleExchangeLike if subtreeHasStreamScan(e) => e
    }
    assert(subtreeHasStreamScan(plan), s"stream scan missing from:\n$plan")
    assert(offenders.isEmpty,
      s"stream-side rows crossed an exchange before the anti join:\n$plan")
  }

  test("first-arrival dedup state carries across micro-batches") {
    val s = spark
    import s.implicits._
    // the q146 composition driven by a two-batch MemoryStream: the
    // dropDuplicatesWithinWatermark state from batch 1 must suppress
    // batch 2's re-delivery of the same fingerprint, while batch 2's
    // genuinely new fingerprint still passes the history anti join
    val historyFps = Seq(Tuple1("old doc")).toDF("t")
      .select(Dedup.fingerprint(col("t")).as("fp"))
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](43, spark, None)
    val novel = input.toDF().toDF("doc_id", "text")
      .select(Dedup.fingerprint(col("text")).as("fp"),
        timestamp_micros(col("doc_id")).as("__ts"))
      .withWatermark("__ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .join(historyFps, Seq("fp"), "left_anti")
      .select(col("fp"))
    val q = novel.writeStream.format("memory").queryName("fa_xbatch")
      .outputMode("append").start()
    try {
      input.addData((1L, "fresh alpha"), (2L, "old doc"))
      q.processAllAvailable()
      input.addData((3L, "fresh alpha"), (4L, "fresh beta"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("fa_xbatch").collect().map(_.getString(0)).toSeq
    val alphaFp = Seq(Tuple1("fresh alpha")).toDF("t")
      .select(Dedup.fingerprint(col("t"))).collect().head.getString(0)
    val betaFp = Seq(Tuple1("fresh beta")).toDF("t")
      .select(Dedup.fingerprint(col("t"))).collect().head.getString(0)
    assert(out.sorted == Seq(alphaFp, betaFp).sorted,
      s"batch-2 re-delivery must be suppressed by carried state: $out")
  }

  test("gap sessionization opens a new session after the gap") {
    val s = spark
    import s.implicits._
    val gap = 1800L * 1000000L
    val evs = Seq(
      StreamingOps.Ev(7L, 1L, 0L),
      StreamingOps.Ev(7L, 2L, gap),          // within gap (== not >)
      StreamingOps.Ev(7L, 3L, 3 * gap),      // new session
      StreamingOps.Ev(8L, 4L, 0L)).toDS()
    val out = StreamingOps.sessionize(evs, gap)
      .collect().map(a => a.event_id -> a.session_seq).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 2L && out(4L) == 1L)
  }

  test("keyed state carries sessions across micro-batches") {
    val s = spark
    import s.implicits._
    val gap = 1800L * 1000000L
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingOps.Ev](42, spark, None)
    val q = StreamingOps.sessionize(input.toDS(), gap).toDF()
      .writeStream.format("memory").queryName("sess_xbatch")
      .outputMode("append").start()
    try {
      input.addData(StreamingOps.Ev(7L, 1L, 0L), StreamingOps.Ev(7L, 2L, gap))
      q.processAllAvailable()
      // batch 2: exactly one gap after batch 1's last event -> same
      // session (== is not >); then a far event -> new session. Both
      // verdicts REQUIRE the (sessionSeq, lastTs) state from batch 1.
      input.addData(StreamingOps.Ev(7L, 3L, 2 * gap),
        StreamingOps.Ev(7L, 4L, 5 * gap))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess_xbatch").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("batch window sessionization == keyed-state sessionization (sf0.001)") {
    val s = spark
    import s.implicits._
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[StreamingOps.Ev]
    val gap = 1800L * 1000000L
    val viaWindow = StreamingOps.sessionizeBatch(evs, gap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaState = StreamingOps.sessionize(evs, gap)
      .collect().map(a => (a.user_id, a.event_id) -> a.session_seq).toMap
    assert(viaWindow == viaState)
  }

  test("streaming hourly agg equals the batch aggregation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.hourlyAggAvailableNow(spark, dir, "spec_sink")
      .orderBy("bucket_start", "event_type").collect()
    val batch = graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_start", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }
}

class ApproxDistinctSpec extends graft.SparkSpec {
  test("HLL estimate within rsd bounds of the exact vocabulary count") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(col("source"),
      explode(graft.operators.Dedup.words(col("text"))).as("w"))
    val joined = words.groupBy("source")
      .agg(approx_count_distinct(col("w"), rsd = 0.02).as("approx"),
        countDistinct(col("w")).as("exact"))
      .collect()
    joined.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"source=${r.getString(0)} a=$a e=$e")
    }
  }
}

class IvfSpec extends graft.SparkSpec {
  test("IVF: every vector lands in exactly one cluster; probes respect nprobe") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Ivf.centroids(e, "vec_id", "embedding", k = 8, iterations = 2)
    assert(cents.count() <= 8 && cents.count() > 1)
    val assigned = Ivf.assign(Ivf.quantized(e, "vec_id", "embedding"), cents)
    assert(assigned.count() == e.count()) // total, single assignment
    val top = Ivf.topK(e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      "vec_id", "embedding", k = 5, numCentroids = 8, iterations = 2, nprobe = 8)
    // probing ALL clusters = brute force: top-1 must match exact search
    val bf = Similarity.bruteForceTopK(e,
      e.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      "vec_id", "embedding", k = 5)
    val t1 = top.filter(org.apache.spark.sql.functions.col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b1 = bf.filter(org.apache.spark.sql.functions.col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t1 == b1)
  }

  test("incremental IVF: occupancy is total on both slices, daily step never touches history") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hist = e.filter(col("vec_id") % 5 =!= 0)
    val fresh = e.filter(col("vec_id") % 5 === 0)
    // stored state: codebook + census, built once from history and
    // MATERIALIZED (collect + rebuild = the persisted index tables a
    // real pipeline reads back) so the daily plan can't silently
    // recompute them from the history scan
    def stored(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    val cbDf = stored(Ivf.centroids(hist, "vec_id", "embedding", 8, 2))
    val codebook = cbDf.collect()
    val census = stored(
      Ivf.occupancy(cbDf, hist, "vec_id", "embedding", "n_hist"))
    val out = Ivf.incrementalCounts(cbDf, census, fresh,
      "vec_id", "embedding").collect()
    // every vector of BOTH slices is assigned exactly once
    assert(out.map(_.getLong(1)).sum == hist.count())
    assert(out.map(_.getLong(2)).sum == fresh.count())
    // the codebook never saw the new batch (fixed-codebook property)
    assert(out.map(_.getLong(0)).toSet ==
      codebook.map(_.getLong(0)).toSet)
    // seeding under id gaps: history excludes ids 0 and 5, so seeds
    // must be the smallest PRESENT ids, not 0..7
    val cids = codebook.map(_.getLong(0)).toSet
    assert(!cids.contains(0L) && !cids.contains(5L))
    // partitioning invariance (integer-exact arithmetic end-to-end)
    val repart = Ivf.incrementalCounts(cbDf,
      Ivf.occupancy(cbDf, hist.repartition(7), "vec_id", "embedding", "n_hist"),
      fresh.repartition(3), "vec_id", "embedding").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      == repart.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    // with stored state, the daily step's plan touches the FRESH slice
    // only — no parquet re-scan of the corpus hides inside
    val dailyPlan = Ivf.incrementalCounts(cbDf, census, fresh,
      "vec_id", "embedding").queryExecution.optimizedPlan.toString
    assert("Relation.*parquet".r.findAllIn(dailyPlan).length == 1,
      s"daily step must scan only the fresh batch:\n$dailyPlan")
  }
}

class StreamDedupSpec extends graft.SparkSpec {
  test("watermarked streaming dedup drops in-window re-deliveries") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val s = spark
    import s.implicits._
    val dir = tmpDir("sdedup")
    // two deliveries of fp "a" within the window, one of "b"
    Seq(("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:10:00"),
        ("b", "2024-01-01 00:20:00"))
      .toDF("fp", "ts_s")
      .select(col("fp"), col("ts_s").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema("fp STRING, ts TIMESTAMP")
      .parquet(s"$dir/in")
    val q = graft.streaming.StreamingOps
      .dedupStream(stream, "fp", "ts", "1 hour")
      .writeStream.format("memory").queryName("sdedup_sink")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sdedup_sink").collect()
    assert(out.length == 2) // "a" deduplicated, "b" kept
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }
}

class AsOfJoinSpec extends graft.SparkSpec {
  test("as-of join: inclusive at equal ts, null before any right row") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    def df(rows: Seq[(Long, Long, Long, Double)]) =
      rows.toDF("user_id", "ts_us", "event_id", "value")
        .select($"user_id", timestamp_micros($"ts_us").as("ts"), $"event_id", $"value")
    val left = df(Seq((1L, 100L, 10L, 0.0), (1L, 200L, 11L, 0.0),
      (1L, 50L, 12L, 0.0), (2L, 100L, 13L, 0.0)))
    val right = df(Seq((1L, 100L, 1L, 7.5), (1L, 150L, 2L, 9.9)))
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(10L) == Some(7.5))  // equal ts -> inclusive match
    assert(out(11L) == Some(9.9))  // latest prior
    assert(out(12L) == None)       // before any right row
    assert(out(13L) == None)       // other key sees nothing
  }
}

class SamplingSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("split is deterministic under repartitioning; proportions sane") {
    val s = spark
    import s.implicits._
    val ids = (1L to 2000L).toDF("doc_id")
    val a = Sampling.withSplit(ids, "doc_id", 5, 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.withSplit(ids.repartition(7), "doc_id", 5, 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // partition layout cannot move a row between splits
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("val") > 50 && n("val") < 150)   // ~5% of 2000
    assert(n("test") > 50 && n("test") < 150)
    assert(n("train") > 1700)
  }

  test("stratified sample plan prunes with WindowGroupLimit") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).map(i => (i, s"s${i % 5}")).toDF("id", "stratum")
    val sampled = Sampling.stratifiedSample(df, "stratum", "id", 10)
    assert(sampled.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "rank<=k filter should push the group limit below the sort")
    assert(sampled.count() == 50)
  }

  test("token-balanced shards: partition of the corpus, imbalance bounded by max doc") {
    val s = spark
    import s.implicits._
    val docs = (1L to 500L).map(i => (i, (i * 13) % 97 + 1)).toDF("doc_id", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("long"))
    val sharded = Sampling.tokenBalancedShards(docs, "doc_id", "n_tokens", 8)
    assert(sharded.count() == 500, "every doc lands in exactly one shard")
    val masses = sharded.groupBy("shard")
      .agg(sum("n_tokens").cast("long").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(masses.map(_._1).sorted.toSeq == (0L to 7L), "all 8 shards populated")
    val maxDoc = 97L
    // each shard's mass stays within one max-document of the ideal span
    val ideal = masses.map(_._2).sum / 8.0
    masses.foreach { case (sh, m) =>
      assert(math.abs(m - ideal) <= maxDoc + 1,
        s"shard $sh mass $m vs ideal $ideal exceeds the max-doc bound")
    }
    // deterministic under repartitioning
    val again = Sampling.tokenBalancedShards(docs.repartition(11),
      "doc_id", "n_tokens", 8)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sharded.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("shard export: on-disk dirs carry the balanced token mass") {
    val s = spark
    import s.implicits._
    val docs = (1L to 400L).map(i => (i, (i * 13) % 97 + 1)).toDF("doc_id", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("long"))
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Sampling.writeShards(docs, "doc_id", "n_tokens", nShards = 4,
        path = out, writeTasks = 8, maxRecordsPerFile = 50L)
      // one directory per shard, hive-style
      val dirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
      assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
      // the artifact a loader reads: per-shard token mass from DISK must
      // keep the assignment's max-doc imbalance bound, and no row lost
      val back = spark.read.parquet(out)
      assert(back.count() == 400)
      val masses = back.groupBy("shard")
        .agg(sum("n_tokens").cast("long").as("m"))
        .collect().map(r => r.getLong(1))
      val ideal = masses.sum / 4.0
      masses.foreach(m => assert(math.abs(m - ideal) <= 97 + 1,
        s"on-disk shard mass $m vs ideal $ideal breaks the max-doc bound"))
      // maxRecordsPerFile bounds every physical file
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
      files.foreach { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        assert(n <= 50L, s"${f.getName} has $n rows > maxRecordsPerFile")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(out))
    }
  }

  test("length-bucketed batches: band bounds waste, batches fill, determinism") {
    val s = spark
    import s.implicits._
    val docs = (1L to 100L).map(i => (i, (i * 7) % 64 + 1)).toDF("doc_id", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("long"))
    val batched = Sampling.lengthBucketedBatches(docs, "doc_id", "n_tokens",
      bandTokens = 16, batchSize = 8)
    // every doc lands in its length band
    assert(batched.filter(expr("n_tokens DIV 16") =!= col("band")).count() == 0)
    val stats = Sampling.batchPaddingStats(batched, "n_tokens").collect()
    // per-row waste bounded by the band width
    stats.foreach { r =>
      val waste = r.getAs[Long]("waste_tokens")
      val n = r.getAs[Long]("n_docs")
      assert(waste <= n * 15, s"waste $waste exceeds band bound for $r")
      assert(n <= 8, "batch never exceeds batchSize")
    }
    // only the LAST batch of a band may be short
    val byBand = stats.groupBy(_.getAs[Long]("band"))
    byBand.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("batch_idx"))
      sorted.init.foreach(r => assert(r.getAs[Long]("n_docs") == 8L))
    }
    // deterministic under repartitioning
    val again = Sampling.lengthBucketedBatches(docs.repartition(13),
      "doc_id", "n_tokens", 16, 8)
      .select("doc_id", "band", "batch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == batched.select("doc_id", "band", "batch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("context packing on a STRING order key (range-partition fallback path)") {
    val s = spark
    import s.implicits._
    // string keys take the repartitionByRange + partition-id path; the
    // spans must still tile the stream in lexicographic key order
    val docs = (1 to 300).map(i => (f"doc_$i%04d", (i * 17L) % 59 + 1))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packContexts(docs, "doc_id", "n_tokens", 128)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "tok_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // driver-side reference: running sum in sorted-key order
    var cum = 0L
    val ref = (1 to 300).map(i => (f"doc_$i%04d", (i * 17L) % 59 + 1))
      .sortBy(_._1).map { case (id, n) => val st = cum; cum += n; (id, st, cum) }
    assert(out.toSeq == ref)
    // deterministic under input repartitioning
    val again = Sampling.packContexts(docs.repartition(7), "doc_id",
      "n_tokens", 128).orderBy("doc_id")
      .select("doc_id", "tok_start", "tok_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == ref)
  }

  test("token budget: null ids take the nulls-first lane, not a join drop") {
    val s = spark
    import s.implicits._
    val docs = Seq((Some(1L), 10L), (None, 5L), (Some(2L), 7L))
      .toDF("doc_id", "n_tokens")
    // budget large enough for everything: no row may vanish at the
    // null-safe offsets join
    val all = Sampling.tokenBudgetSubset(docs, "doc_id", "n_tokens", 1000L)
    assert(all.count() == 3)
    // null hashes sort first (window NULLS FIRST): a 6-token budget
    // covers the null row (5) and the first hashed doc crosses the line
    val cut = Sampling.tokenBudgetSubset(docs, "doc_id", "n_tokens", 6L)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(cut.contains(-1L), "null-id row must be inside the budget prefix")
    assert(cut.size == 2, s"expected null row + one crossing doc, got $cut")
  }

  test("context packing: spans tile the token stream, straddle is consistent") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 0L), (4L, 1100L), (5L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packContexts(docs, "doc_id", "n_tokens", 512)
      .orderBy("doc_id").collect()
    // spans tile: each start = previous end
    val spans = out.map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
    assert(spans.head._1 == 0L)
    spans.sliding(2).foreach { case Array((_, e), (s2, _)) => assert(e == s2) }
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("chunk_first"), r.getAs[Long]("chunk_last"))).toMap
    assert(byId(1L) == (0L, 0L))   // [0,300) inside chunk 0
    assert(byId(2L) == (0L, 1L))   // [300,600) straddles the 512 cut
    assert(byId(3L) == (1L, 1L))   // empty doc anchors at its offset
    assert(byId(4L) == (1L, 3L))   // [600,1700) spans chunks 1..3
    assert(byId(5L) == (3L, 3L))
  }

  test("split leakage: copies across the boundary counted, clean corpus reports zero") {
    val s = spark
    import s.implicits._
    // give every id its hash split, then plant one text on BOTH sides
    // of each boundary we expect to count — derive the sides from
    // splitBucket itself so the fixture can't rot if pcts change
    val ids = (1L to 200L).toDF("doc_id")
      .withColumn("b", Sampling.splitBucket(col("doc_id")))
    val buckets = ids.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pick(p: Long => Boolean): Seq[Long] =
      buckets.toSeq.filter { case (_, b) => p(b) }.map(_._1).sorted
    val train = pick(b => b >= 10)
    val vl = pick(b => b < 5)
    val ts = pick(b => b >= 5 && b < 10)
    assert(train.nonEmpty && vl.nonEmpty && ts.nonEmpty)
    val docs = Seq(
      (train(0), "leak tv"), (vl(0), "leak tv"),       // train ∩ val
      (train(1), "leak tt"), (ts(0), "leak tt"),       // train ∩ test
      (vl(1), "leak vt"), (ts(1), "leak vt"),          // val ∩ test
      (train(2), "dup same side"), (train(3), "dup same side"),
      (train(4), "unique a"), (vl(2), "unique b")
    ).toDF("doc_id", "text")
    val r = Sampling.splitLeakage(docs, "doc_id", "text", 5, 5)
      .collect().head
    assert(r.getAs[Long]("n_dup_fps") == 4L)    // 3 leaks + same-side dup
    assert(r.getAs[Long]("n_leaky_fps") == 3L)  // same-side dup not a leak
    assert(r.getAs[Long]("n_train_val") == 1L)
    assert(r.getAs[Long]("n_train_test") == 1L)
    assert(r.getAs[Long]("n_val_test") == 1L)
    // a corpus with unique text leaks nothing
    val clean = Seq((train(0), "aa"), (vl(0), "bb"), (ts(0), "cc"))
      .toDF("doc_id", "text")
    val c = Sampling.splitLeakage(clean, "doc_id", "text", 5, 5)
      .collect().head
    assert((0 until 5).forall(c.getLong(_) == 0L))
  }

  test("near-dup leakage: cross-split verified pairs classified, within-split separated") {
    val s = spark
    import s.implicits._
    val ids = (1L to 200L).toDF("doc_id")
      .withColumn("b", Sampling.splitBucket(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pick(p: Long => Boolean): Seq[Long] =
      ids.toSeq.filter { case (_, b) => p(b) }.map(_._1).sorted
    val train = pick(b => b >= 10)
    val vl = pick(b => b < 5)
    // identical docs share every LSH band -> the pair is ALWAYS
    // proposed, which keeps the fixture deterministic (a merely-similar
    // pair is proposed only with banding probability)
    val copyA = "alpha beta gamma delta epsilon zeta eta theta"
    val copyB = "iota kappa lambda mu nu xi omicron pi rho"
    val docs = Seq(
      (train(0), copyA), (vl(0), copyA),      // cross train/val
      (train(1), copyB), (train(2), copyB),   // within train
      (train(3), "one filler text here alone entirely"),
      (vl(1), "another filler document with different words")
    ).toDF("doc_id", "text")
    val r = Sampling.nearDupLeakage(docs, "doc_id", "text", 5, 5)
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 2L)
    assert(r.getAs[Long]("n_within") == 1L)
    assert(r.getAs[Long]("n_cross") == 1L)
    assert(r.getAs[Long]("n_train_val") == 1L)
    assert(r.getAs[Long]("n_train_test") == 0L)
    assert(r.getAs[Long]("n_val_test") == 0L)
  }

  test("shard manifest: checksum is partition/order-invariant and catches a content edit") {
    val s = spark
    import s.implicits._
    val docs = (1L to 120L)
      .map(i => (i, s"document number $i body text", 3L + i % 5))
      .toDF("doc_id", "text", "n_tokens")
    val m1 = Sampling.shardManifest(docs, "doc_id", "n_tokens", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(m1.map(_._1).toSeq == (0L to 3L), "one row per shard")
    val m2 = Sampling.shardManifest(docs.repartition(13), "doc_id",
        "n_tokens", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(m1.toSeq == m2.toSeq, "manifest depends on partitioning")
    // edit ONE document's text: its shard's checksum must change while
    // doc count and token mass stay identical — the corruption class
    // counts cannot see
    val edited = docs.withColumn("text",
      when(col("doc_id") === 60L, lit("tampered")).otherwise(col("text")))
    val m3 = Sampling.shardManifest(edited, "doc_id", "n_tokens", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(m3.map(x => (x._1, x._2, x._3)).toSeq ==
      m1.map(x => (x._1, x._2, x._3)).toSeq,
      "counts and token mass must not see the edit")
    assert(m3.map(_._4).toSeq != m1.map(_._4).toSeq,
      "checksum must catch the edit")
  }

  test("weighted sample: equals brute-force A-ES, zero weights excluded, repartition-invariant") {
    val s = spark
    import s.implicits._
    // weights 0..6 cycle; ids with weight 0 must be ineligible
    val df = (1L to 300L).map(id => (id, id % 7)).toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, "doc_id", "w", n = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // brute-force twin: same md5-uniform, same ln(u)/w key
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = (1L to 300L)
      .map(id => (id, id % 7))
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val u = (h60(id) + 1L).toDouble / 1152921504606846976L.toDouble
        (math.log(u) / w.toDouble, id, w)
      }
      .sortBy { case (k, id, _) => (-k, id) }
      .take(10).zipWithIndex
      .map { case ((_, id, w), i) => (i + 1, id, w) }
    assert(got.toSeq == expect.toSeq)
    assert(got.forall(_._3 > 0), "a zero-weight row was sampled")
    val again = Sampling.weightedSample(df.repartition(7), "doc_id", "w", 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq, "sample depends on partitioning")
  }

  test("split repair: leaky groups adopt the leader's split, same-side dups untouched") {
    val s = spark
    import s.implicits._
    val ids = (1L to 200L).toDF("doc_id")
      .withColumn("b", Sampling.splitBucket(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pick(p: Long => Boolean): Seq[Long] =
      ids.toSeq.filter { case (_, b) => p(b) }.map(_._1).sorted
    val train = pick(b => b >= 10)
    val vl = pick(b => b < 5)
    val ts = pick(b => b >= 5 && b < 10)
    // groups: (leader train, dup val) moves dup -> train;
    // (leader val, dups train+test) moves both -> val;
    // same-side train pair → no move; unique docs → no move.
    // Every fixture id is taken at most ONCE — a reused id would fuse
    // two text groups through the shared doc and break the invariant.
    val used = scala.collection.mutable.Set.empty[Long]
    def take(seq: Seq[Long], p: Long => Boolean = _ => true): Long = {
      val id = seq.find(x => !used(x) && p(x)).get; used += id; id
    }
    val g1dup = take(vl)
    val g1leader = take(train, _ < g1dup)
    val g2leader = take(vl,
      v => train.exists(t => !used(t) && t > v) &&
        ts.exists(x => !used(x) && x > v))
    val g2train = take(train, _ > g2leader)
    val g2test = take(ts, _ > g2leader)
    val docs = Seq(
      (g1leader, "group one"), (g1dup, "group one"),
      (g2leader, "group two"), (g2train, "group two"), (g2test, "group two"),
      (take(train), "same side"), (take(train), "same side"),
      (take(train), "unique a"), (take(ts), "unique b")
    ).toDF("doc_id", "text")
    val moved = Sampling.repairSplitLeakage(docs, "doc_id", "text", 5, 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(moved == Set(
      (g1dup, "val", "train"),
      (g2train, "train", "val"),
      (g2test, "test", "val")))
    // post-repair property: within every fp group, one split remains
    val ledger = moved.map(m => m._1 -> m._3).toMap
    val post = docs
      .withColumn("split", Sampling.splitOf(col("doc_id"), 5, 5))
      .collect()
      .map(r => (r.getString(1),
        ledger.getOrElse(r.getLong(0), r.getString(2))))
      .groupBy(_._1).map { case (_, g) => g.map(_._2).distinct.length }
    assert(post.forall(_ == 1), "a repaired group still spans splits")
  }

  test("equi-depth buckets: equal counts ±1, order-consistent, window-equivalent") {
    val s = spark
    import s.implicits._
    // skewed scores with heavy ties, shuffled ids
    val rows = (1L to 500L).map(i => (i * 37 % 501, (i * i) % 13))
      .toDF("doc_id", "score")
      .withColumn("score", col("score").cast("long"))
    val k = 10
    val got = Sampling.equiDepthBuckets(rows, "doc_id", "score", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: plain global window rank
    import org.apache.spark.sql.expressions.Window
    val ref = rows
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score"), col("doc_id"))))
      .withColumn("bucket", expr(s"CAST((rn - 1) * $k AS BIGINT) DIV 500L"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("bucket")))
    assert(got.sortBy(_._1).toSeq == ref.sortBy(_._1).toSeq)
    val sizes = got.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced buckets: $sizes")
    // repartitioning must not change a single assignment
    val reparted = Sampling.equiDepthBuckets(rows.repartition(13),
        "doc_id", "score", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reparted.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // non-integral scores are rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.equiDepthBuckets(
        rows.withColumn("score", col("score").cast("double")),
        "doc_id", "score", k)
    }
  }

  test("equi-depth micro adapter: float scores, floor quantization, tie collapse") {
    val s = spark
    import s.implicits._
    val rows = (1L to 400L).map { i =>
      // negative and positive floats, with deliberate sub-micro ties:
      // i=1..4 map to 0.5 + {0, 1e-9, 2e-9, 3e-9} — one micro quantum
      val base = if (i <= 4) 0.5 + (i - 1) * 1e-9
                 else (i * 73 % 101) - 50.25
      (i, base)
    }.toDF("doc_id", "score")
    val k = 8
    val got = Sampling.equiDepthBucketsMicro(rows, "doc_id", "score", k)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // reference: rank over (floor(score*1e6), doc_id)
    import org.apache.spark.sql.expressions.Window
    val ref = rows
      .withColumn("m", floor(col("score") * 1e6).cast("long"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("m"), col("doc_id"))))
      .withColumn("bucket", expr(s"CAST((rn - 1) * $k AS BIGINT) DIV 400L"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[Long]("bucket")))
    assert(got.sortBy(_._1).toSeq == ref.sortBy(_._1).toSeq)
    val sizes = got.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced buckets: $sizes")
    // sub-micro ties collapsed to one quantum → id tie-break ordered
    val tied = got.filter(_._1 <= 4).sortBy(_._1).map(_._3)
    assert(tied.toSeq == tied.sorted.toSeq)
    // score column survives untouched, helper column dropped
    assert(Sampling.equiDepthBucketsMicro(rows, "doc_id", "score", k)
      .columns.toSeq == Seq("doc_id", "score", "bucket"))
    // integral scores are pointed at the exact form
    intercept[IllegalArgumentException] {
      Sampling.equiDepthBucketsMicro(
        rows.withColumn("score", lit(1L)), "doc_id", "score", k)
    }
  }
}
