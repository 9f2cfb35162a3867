package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY.md §7.5):
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All pure column expressions over codegen'd built-ins — they run inside
  * whole-stage codegen, shuffle nothing, and are reproducible in ANSI SQL
  * for the oracle gate. Counting tricks use length-difference arithmetic
  * (`len(t) - len(replace(t, x, ''))`) so no explode is ever needed in
  * the per-document hot path.
  */
object TextAnalysis {

  /** Small stopword profiles for the n-gram/stopword language heuristic.
    * Deliberately tiny and hardcoded: the operator's job is deterministic
    * scoring, not linguistic coverage. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "es", "por", "para"))

  /** Exact occurrence count of `word` in a normalized word ARRAY.
    * (An earlier replace-and-measure-length version undercounted
    * immediately repeated words — "the the" counted 1 — because the
    * non-overlapping replace consumes the shared boundary space.)
    * Pass a BOUND words column (`Dedup.words(text)` selected first),
    * not an inline split — see [[Dedup.wordShingles]] on per-element
    * re-evaluation in higher-order functions. */
  def wordCount(wordsCol: Column, word: String): Column =
    size(filter(wordsCol, w => w === lit(word))).cast("long")

  /** Total stopword hits for one language profile over a words array. */
  def stopwordScore(wordsCol: Column, lang: String): Column =
    stopwords(lang).map(wordCount(wordsCol, _)).reduce(_ + _)

  /** Predicted language: argmax of the profile scores, ties broken by
    * profile order (en > de > fr > es); 'und' when nothing hits. */
  def predictedLanguage(scores: Map[String, Column]): Column = {
    val ordered = Seq("en", "de", "fr", "es")
    val best = greatest(ordered.map(scores): _*)
    ordered.foldRight(lit("und")) { (l, acc) =>
      when(scores(l) === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Whitespace token count (reference-faithful split on `\s+`). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish token estimate: ceil(non-space chars / 4) — the standard
    * chars-per-token heuristic, exact integer arithmetic. The documented
    * FAST PATH: O(1) per row, no merges table. For the exact count
    * under a pinned merges table use [[bpeTokenCount]]. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(regexp_replace(text, "\\s", "")) / lit(4.0)).cast("long")

  /** EXACT greedy BPE token count over the pinned
    * [[graft.functions.BpeTokenizer.merges]] table — a native
    * codegen'd expression (in-row symbol merging, per-thread word
    * memo, zero shuffle). Contrast [[bpeTokenEstimate]], the O(1)
    * heuristic: use the estimate for monitoring-grade counts, this for
    * token-budget decisions that must reproduce a tokenizer bit-exactly. */
  def bpeTokenCount(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BpeTokenCount(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** The bracket-encoded training stream (`<c>` per char, `<|>` word
    * boundaries) — native single pass; see
    * [[graft.functions.BpeBracketizeExpr]]. */
  private def bracketize(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BpeBracketizeExpr(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** The document's BPE symbol stream (word boundaries as `|`) under
    * the pinned merges — the input to [[bpeMergeCensus]]. */
  def bpeSymbols(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BpeSymbolStream(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** One BPE TRAINING step, distributed: count adjacent symbol pairs
    * (within words — pairs touching the `|` boundary are skipped)
    * across the whole corpus under the CURRENT merges table, rank the
    * candidates. The top row IS the next merge rule a BPE trainer
    * would adopt; iterating this census is exactly how a tokenizer is
    * induced from a corpus. Output: (sym_a, sym_b, cnt), top `n` by
    * (cnt desc, sym_a asc, sym_b asc) — the deterministic-cut
    * discipline of [[vocabTopN]].
    *
    * Scale shape: symbol streams are computed IN-ROW (native
    * expression, per-thread word memo), the pair expansion is in-row
    * (the bound-attribute shingle discipline — no re-encode per
    * element), pair counts partial-combine map-side to ≤ |sym-vocab|²
    * combined rows per task (symbol vocabularies are thousands, not
    * corpus-sized), and the global top-n is TakeOrderedAndProject.
    * One exchange, bounded output, nothing corpus-wide sorts. */
  def bpeMergeCensus(docs: DataFrame, textCol: String, n: Int): DataFrame =
    pairCensus(docs.select(bpeSymbols(col(textCol)).as("__syms")))
      .orderBy(col("cnt").desc, col("sym_a").asc, col("sym_b").asc)
      .limit(n)

  /** Unordered within-word pair census over a bound `__syms` symbol
    * array column — the shared core of [[bpeMergeCensus]] (one step
    * under the pinned merges) and [[bpeTrain]] (iterated from
    * scratch). In-row pair expansion, partial-combining count. */
  private def pairCensus(syms: DataFrame): DataFrame =
    syms
      // barrier (r18): the length filter sits between the caller's
      // symbol extraction and this scan — unpersisted, pushdown clones
      // the whole regexp extraction into the Filter and the corpus
      // symbolizes twice (the winnowFingerprints pathology; the pair
      // transform below is cheap per row, the extraction is not)
      .transform(graft.util.CacheScope.persist)
      .filter(size(col("__syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__syms) - 2), " +
          "i -> struct(__syms[i] AS sym_a, __syms[i + 1] AS sym_b))"))
        .as("p"))
      .select(col("p.sym_a"), col("p.sym_b"))
      .filter(col("sym_a") =!= "|" && col("sym_b") =!= "|")
      .groupBy(col("sym_a"), col("sym_b"))
      .agg(count(lit(1)).as("cnt"))

  /** Distributed BPE TRAINING, the full loop [[bpeMergeCensus]] is one
    * step of: starting from bare characters (NO pinned merges — this
    * is tokenizer induction from scratch), repeat `rounds` times:
    * census adjacent within-word symbol pairs corpus-wide, adopt the
    * top pair (cnt desc, then sym_a/sym_b asc — a total order, so the
    * choice is deterministic), fuse every occurrence, continue on the
    * fused stream. Output: the adopted merge table,
    * (round, sym_a, sym_b, cnt) — feed it to a
    * [[graft.functions.BpeTokenizer]]-style encoder and you have a
    * corpus-fitted tokenizer.
    *
    * Representation: the stream is ONE bracket-encoded string per
    * document (`<sym>` per symbol, `<|>` word boundaries — the q113
    * oracle encoding promoted to the engine side), so "fuse every
    * adjacent (a,b)" is a single `replace(s, '<a><b>', '<ab>')`:
    * left-to-right and non-overlapping in every engine, which IS the
    * canonical one-pass merge semantics, and the brackets make a
    * partial-symbol match impossible.
    *
    * Scale shape — the INCREMENTAL PAIR-DELTA census: only round 1
    * counts the whole corpus. After adopting merge (a, b), the only
    * pairs whose counts change are those touching a fuse site, so each
    * later round applies a DELTA computed from the occurrence
    * junctions of `<a><b>` ([[bpeCensusDelta]]): the aggregation
    * traffic is O(occurrences of the adopted pair) — which shrinks
    * down the Zipf tail as training proceeds — instead of O(corpus
    * tokens) every round. At real tokenizer scale (30k+ merges) the
    * recounting form is O(rounds × corpus) and unusable; the delta
    * form's total census traffic is O(corpus + Σ occurrences) ≈
    * O(corpus). Per round: ONE bounded driver action (the top-1
    * collect on the maintained ≤ |sym-vocab|² census table — the
    * PageRank loop discipline), one map-side `contains` scan to find
    * affected docs, and one cheap corpus-wide literal `replace` to
    * advance the stream. The corpus-wide `regexp_extract_all` symbol
    * re-extraction of the recount form is gone entirely — the delta
    * reads symbols only around fuse sites. Stream and census persist
    * with generation rotation (a stream must outlive its successor's
    * materialization, so two generations stay cached).
    *
    * [[bpeTrainRecount]] keeps the naive full-recount loop as the
    * equivalence baseline: BpeTokenizerSpec pins delta ≡ recount
    * round-for-round, and the q137 oracle remains the unrolled
    * full-recount CTE chain — every gate run re-proves the delta
    * census is a pure optimization. Training stops early if no
    * in-word pair remains (single-symbol corpus). */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val symsOf = expr("regexp_extract_all(__s, '<([^<>]*)>', 1)")
    var stream = docs
      .select(bracketize(col(textCol)).as("__s"))
      .persist()
    // round-1 census: the one full-corpus count
    var census = pairCensus(
      stream.withColumn("__syms", symsOf).select(col("__syms")))
      .persist()
    var prevCensus: Option[DataFrame] = None
    // streams awaiting unpersist: s_{r-1} materializes only when round
    // r+1's collect computes delta_r, and that computation rebuilds
    // s_{r-1} from s_{r-2} — so TWO generations must stay cached
    val oldStreams = scala.collection.mutable.Queue.empty[DataFrame]
    val adopted = scala.collection.mutable.ArrayBuffer.empty[
      (Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = census
        .orderBy(col("cnt").desc, col("sym_a").asc, col("sym_b").asc)
        .limit(1)
        .collect()
      // the collect materialized `census` (and, transitively, the
      // previous round's delta and its stream) — the generation
      // before is now free
      prevCensus.foreach(_.unpersist(blocking = false))
      prevCensus = None
      while (oldStreams.size > 1)
        oldStreams.dequeue().unpersist(blocking = false)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        adopted += ((r, a, b, c))
        // literal (non-regex) replace — symbols stay in [a-z0-9], so
        // interpolation is safe and the semantics match the oracle's
        // `replace` exactly (left-to-right, non-overlapping). The
        // final round's pick needs no fused successor or delta.
        if (r < rounds) {
          prevCensus = Some(census)
          census = census
            .unionByName(bpeCensusDelta(stream, a, b))
            .groupBy(col("sym_a"), col("sym_b"))
            .agg(sum(col("cnt")).as("cnt"))
            .filter(col("cnt") > 0)
            .persist()
          oldStreams.enqueue(stream)
          stream = stream
            .select(expr(s"replace(__s, '<$a><$b>', '<$a$b>')").as("__s"))
            .persist()
        }
      }
      r += 1
    }
    stream.unpersist(blocking = false)
    oldStreams.foreach(_.unpersist(blocking = false))
    census.unpersist(blocking = false)
    prevCensus.foreach(_.unpersist(blocking = false))
    adopted.toSeq.toDF("round", "sym_a", "sym_b", "cnt")
      .orderBy(col("round"))
  }

  /** The pair-census DELTA of fusing every `<a><b>` occurrence in a
    * bracket-encoded stream — signed (sym_a, sym_b, cnt) rows such
    * that census(fused) = census(stream) ⊎ delta, exactly. The
    * junction algebra and the occurrence walk live in the native
    * [[graft.functions.BpeCensusDeltaExpr]] (indexOf-driven, O(occurrences)
    * allocation — a declarative split-the-affected-docs form was
    * measured 2× slower because it re-allocates every affected
    * document as part strings each round). ≤ 5 signed rows per
    * occurrence flow into a partial-combining sum; nothing corpus-wide
    * aggregates. */
  private def bpeCensusDelta(stream: DataFrame, a: String,
      b: String): DataFrame =
    stream
      .select(explode(org.apache.spark.sql.graft.Bridge.column(
        graft.functions.BpeCensusDeltaExpr(
          org.apache.spark.sql.graft.Bridge.expression(col("__s")),
          a, b))).as("d"))
      .select(col("d.sym_a"), col("d.sym_b"), col("d.cnt"))

  /** The naive full-recount training loop — one complete corpus pair
    * census per round. Kept as the EQUIVALENCE BASELINE for
    * [[bpeTrain]]'s delta census (BpeTokenizerSpec pins the two
    * adopted-merge tables identical round-for-round); at real merge
    * counts this form is O(rounds × corpus) and must not ship in a
    * production path. */
  private[graft] def bpeTrainRecount(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val symsOf = expr("regexp_extract_all(__s, '<([^<>]*)>', 1)")
    var stream = docs
      .select(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9]+", "|"),
        "(.)", "<$1>").as("__s"))
      .withColumn("__syms", symsOf)
      .persist()
    var prev: Option[DataFrame] = None
    val adopted = scala.collection.mutable.ArrayBuffer.empty[
      (Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCensus(stream.select(col("__syms")))
        .orderBy(col("cnt").desc, col("sym_a").asc, col("sym_b").asc)
        .limit(1)
        .collect()
      // the collect materialized `stream`; its parent is now free
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(stream)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        adopted += ((r, a, b, c))
        if (r < rounds) stream = stream
          .select(expr(s"replace(__s, '<$a><$b>', '<$a$b>')").as("__s"))
          .withColumn("__syms", symsOf)
          .persist()
      }
      r += 1
    }
    stream.unpersist(blocking = false)
    prev.foreach(_.unpersist(blocking = false))
    adopted.toSeq.toDF("round", "sym_a", "sym_b", "cnt")
      .orderBy(col("round"))
  }

  /** [[bpeTrain]] composed with its APPLY: induce `rounds` merges from
    * the corpus, then tokenize the SAME corpus under the trained table
    * and emit per-document trained-token counts — the end-to-end
    * "fit a tokenizer, count your dataset with it" pass that sizes a
    * training run. The apply is the q113 replace-chain on the bracket
    * stream, built from the JUST-TRAINED merges (a driver-side
    * `rounds`-row table), and the count is the same length-difference
    * arithmetic as the generated oracle — so train AND apply are both
    * hash-gated in one query. The apply pass is one map-side scan:
    * chained literal replaces + two more literal replaces for the
    * count, zero shuffle beyond the training rounds themselves. */
  def bpeTrainAndTokenize(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val merges = bpeTrain(docs, textCol, rounds).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val base = docs.select(col(idCol), bracketize(col(textCol)).as("__s"))
    val fused = merges.foldLeft(base) { case (df, (a, b)) =>
      df.withColumn("__s", expr(s"replace(__s, '<$a><$b>', '<$a$b>')"))
    }
    fused
      .select(col(idCol), expr(
        "CAST(length(__s) - length(replace(__s, '<', '')) - " +
          "(length(__s) - length(replace(__s, '<|>', ''))) DIV 3 AS BIGINT)")
        .as("n_tokens_trained"))
      .orderBy(col(idCol))
  }

  private def countMatching(text: Column, charClassRegex: String): Column =
    length(regexp_replace(text, charClassRegex, "")).cast("long")

  /** Character-class counts (kept to explicit ASCII classes so Java and
    * RE2 regex dialects agree). */
  def punctCount(text: Column): Column = countMatching(text, "[^.,!?;:]")
  def digitCount(text: Column): Column = countMatching(text, "[^0-9]")
  def upperCount(text: Column): Column = countMatching(text, "[^A-Z]")

  /** Composite quality score in [0,1]: long-enough, low punctuation/digit
    * noise, reasonable stopword density. Weights are the operator's
    * contract (documented, deterministic), not a tuned model.
    * `wordsCol` must be the bound normalized words array. */
  def qualityScore(text: Column, wordsCol: Column): Column = {
    val n = length(text).cast("double")
    val tokens = tokenCount(text).cast("double")
    val stop = stopwordScore(wordsCol, "en").cast("double")
    val lenScore = least(n / lit(500.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(n, lit(1.0))
    val digitRatio = digitCount(text).cast("double") / greatest(n, lit(1.0))
    val stopRatio = stop / greatest(tokens, lit(1.0))
    round(
      lit(0.4) * lenScore +
        lit(0.2) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) +
        lit(0.2) * (lit(1.0) - least(digitRatio * 10.0, lit(1.0))) +
        lit(0.2) * least(stopRatio * 5.0, lit(1.0)),
      6)
  }

  /** [[qualityScore]] in integer MICRO-units (score · 10⁶ as a long).
    * The score is already round(·, 6), so the micro value is exact —
    * and once quality is an integer, downstream MEANS can be computed
    * as `sum DIV count` (exact, order-independent, hash-gateable)
    * instead of a double mean whose value depends on partial-sum
    * order. The [[Curation.domainQualityReport]] input contract. */
  def qualityMicro(text: Column, wordsCol: Column): Column =
    round(qualityScore(text, wordsCol) * lit(1000000.0)).cast("long")

  /** 32-bit numeric fingerprint from the md5 content digest. */
  def fingerprint32(text: Column): Column =
    conv(substring(Dedup.fingerprint(text), 1, 8), 16, 10).cast("long")

  // ------------------------------------------------------- repetition

  /** Highest multiplicity of any single word in the words array,
    * computed IN-ROW (zero shuffle): the max run length in the sorted
    * array equals the max per-word count. An `aggregate` fold with a
    * (prev, run, best) struct state — the only non-lambda argument is
    * the bound array itself, evaluated once. */
  def maxWordMultiplicity(wordsCol: Column): Column =
    aggregate(
      array_sort(wordsCol),
      struct(
        lit(null).cast("string").as("prev"),
        lit(0L).as("run"),
        lit(0L).as("best")),
      (s, x) => {
        val run = when(x === s.getField("prev"), s.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))

  /** Gopher-style repetition flags over a bound words array: duplicate
    * word fraction and most-frequent-word fraction, all in-row — the
    * shuffle-free complement to the exploded vocabulary census (q25). */
  def repetitionStats(wordsCol: Column): (Column, Column, Column, Column) = {
    val nWords = size(wordsCol).cast("long")
    val nDistinct = size(array_distinct(wordsCol)).cast("long")
    val dupFrac = lit(1.0) -
      nDistinct.cast("double") / greatest(nWords, lit(1L)).cast("double")
    val topFrac = maxWordMultiplicity(wordsCol).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    (nWords, nDistinct, dupFrac, topFrac)
  }

  // ------------------------------------------------------- PII scrub

  /** Explicit ASCII-only patterns so the Java (Spark) and RE2 (DuckDB)
    * regex dialects match match-for-match. */
  val EmailRegex = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val UrlRegex = "https?://[^ \\t\\n]+"
  val NumRunRegex = "[0-9][0-9][0-9]+"

  /** Number of regex matches in the ORIGINAL text (counted before any
    * scrubbing so overlapping patterns don't hide each other). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Bigram collocations ranked by lift = N·c(ab) / (c(a)·c(b)) — the
    * division-only association measure (PMI is its log, and log/ln are
    * the libm last-ulp trap the oracle rules ban). Output: (w1, w2,
    * c_ab, lift, rnk) for the topN pairs with c_ab ≥ minCount.
    *
    * Scale design: bigram extraction is IN-ROW — `arrays_zip` of two
    * slices of the bound words column (no lambda touches the text, so
    * the per-element re-evaluation trap can't bite; a generator row is
    * produced per TOKEN, which is the irreducible cost of counting
    * bigrams). Two hash aggregations (bigram counts, unigram counts)
    * partial-combine map-side to vocabulary size; the unigram table and
    * the 1-row total are broadcast, so the only wide exchange carries
    * ≤ vocab² partial bigram counts per task.
    *
    * Exactness: lift's numerator and denominator are exact BIGINT
    * products (token counts are far below 2³¹, so the products sit
    * under 2⁶²); the single double division at the end is the same two
    * operands in any engine. */
  def collocations(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minCount: Long, topN: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), Dedup.words(col(textCol)).as("w"))
    val pairs = toks
      // greatest(..., 0): slice throws on a negative length, and a
      // 0/1-word document must yield zero bigrams, not an error
      .withColumn("w1s",
        slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))))
      .withColumn("w2s",
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))))
      .select(explode(arrays_zip(col("w1s"), col("w2s"))).as("p"))
      .select(col("p.w1s").as("w1"), col("p.w2s").as("w2"))
    val bi = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = bi.agg(sum(col("c_ab")).as("n"))

    val ord = Seq(col("lift").desc, col("w1").asc, col("w2").asc)
    bi.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.withColumnRenamed("t", "w1")
        .withColumnRenamed("c", "c_a")), "w1")
      .join(broadcast(uni.withColumnRenamed("t", "w2")
        .withColumnRenamed("c", "c_b")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("n") * col("c_ab")).cast("double") /
          (col("c_a") * col("c_b")).cast("double"))
      .orderBy(ord: _*)
      .limit(topN)
      .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("w1"), col("w2"), col("c_ab"), col("lift"), col("rnk"))
  }

  /** Per-document bigram language-model cross-entropy — the CCNet-style
    * statistical quality filter: train an MLE bigram model on the
    * corpus itself, score each document by its average surprisal
    * −(1/n)·Σ log₂ P(w₂|w₁) under that model. Fluent, corpus-typical
    * text scores low; gibberish and boilerplate-with-rare-joins score
    * high. `n_rare` (bigrams whose corpus count ≤ rareMax) is the
    * integer-exact companion signal.
    *
    * Scale shape: unigram/bigram count tables are vocabulary-sized
    * (sub-linear in corpus size) and partial-aggregate map-side; the
    * per-document scoring join shuffles on (w1, w2) — no broadcast
    * assumption, no collect. At 100 TB the count tables are the only
    * state that grows with vocabulary, not corpus.
    *
    * Engine parity: the float entropy is NOT an oracle-hashed column
    * (Σ log₂ is libm- and fold-order-dependent); the gate hashes the
    * integer columns plus an `entropy_ok` range assertion, and
    * TextAnalysisSpec pins the exact entropy on a hand corpus — the
    * same split as q33's HLL (exact ints under the hash, the
    * non-portable float behind a pinned bound).
    *
    * Output: (idCol, n_bigrams, n_distinct_bigrams, n_rare,
    * entropy — double, drop before hashing, entropy_ok). Documents
    * with < 2 words keep a row (zero bigrams, entropy 0).
    */
  /** Per-doc (w1, w2) adjacent word pairs — the stream both the LM
    * census and the per-doc scoring consume. */
  private def bigramPairs(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), Dedup.words(col(textCol)).as("w"))
      .withColumn("w1s",
        slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))))
      .withColumn("w2s",
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))))
      .select(col(idCol), explode(arrays_zip(col("w1s"), col("w2s"))).as("p"))
      .select(col(idCol), col("p.w1s").as("w1"), col("p.w2s").as("w2"))

  /** The corpus bigram census (w1, w2, c_ab) — the MODEL TABLE
    * [[bigramLm]] scores against, standalone so it can be stored and
    * maintained incrementally ([[incrementalBigramCensus]]). */
  def bigramCensus(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    bigramPairs(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))

  /** O(new)-per-day maintenance of the stored [[bigramCensus]] — the
    * q147 incremental-index discipline applied to the LM model table:
    * counts add under an append-only corpus, the stored census
    * (vocabulary²-bounded, in practice ≪ corpus) never crosses an
    * exchange — the batch census broadcasts into a map-side merge
    * join, and brand-new bigrams append via a broadcast anti join
    * against the touched set. Bit-identical to recomputing the census
    * over history ∪ batch (the q150 gate oracle); unigram LHS totals
    * re-derive from the census by construction (Σ_b c(a,b)), so the
    * scoring model needs no second ledger. */
  def incrementalBigramCensus(stored: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val b = bigramCensus(batch, idCol, textCol)
      .select(col("w1"), col("w2"), col("c_ab").as("__c_b"))
      .transform(graft.util.CacheScope.persist)
    val merged = stored
      .join(broadcast(b), Seq("w1", "w2"), "left")
      .select(col("w1"), col("w2"),
        (col("c_ab") + coalesce(col("__c_b"), lit(0L))).as("c_ab"))
    val touched = stored.select(col("w1"), col("w2"))
      .join(broadcast(b.select(col("w1"), col("w2"))), Seq("w1", "w2"),
        "left_semi")
    val fresh = b
      .join(broadcast(touched), Seq("w1", "w2"), "left_anti")
      .select(col("w1"), col("w2"), col("__c_b").as("c_ab"))
    merged.unionByName(fresh)
  }

  /** Word frequency census (w, f) — the stored state behind the
    * frequency SPECTRUM (frequency-of-frequencies). */
  def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Frequency spectrum from a (w, f) census: how many distinct words
    * occur exactly f times. */
  def frequencySpectrum(census: DataFrame): DataFrame =
    census.groupBy(col("f")).agg(count(lit(1)).as("n_words"))

  /** O(new)-per-day maintenance of the word census + spectrum — the
    * [[incrementalBigramCensus]] discipline applied to the unigram
    * table: counts add under an append-only corpus, the stored census
    * (vocabulary-bounded, ≪ corpus) merges the broadcast batch census
    * map-side and fresh words append via a broadcast anti join. The
    * spectrum re-derives from the merged census (it is a grouped view
    * of the state, not state itself). Bit-identical to recomputing
    * over history ∪ batch — the gate oracle is the full recompute. */
  def incrementalFrequencySpectrum(stored: DataFrame, batch: DataFrame,
      textCol: String): DataFrame = {
    val b = wordCensus(batch, textCol)
      .select(col("w"), col("f").as("__f_b"))
      .transform(graft.util.CacheScope.persist)
    val merged = stored
      .join(broadcast(b), Seq("w"), "left")
      .select(col("w"), (col("f") + coalesce(col("__f_b"), lit(0L))).as("f"))
    val fresh = b
      .join(broadcast(stored.select(col("w"))
        .join(broadcast(b.select(col("w"))), Seq("w"), "left_semi")),
        Seq("w"), "left_anti")
      .select(col("w"), col("__f_b").as("f"))
    frequencySpectrum(merged.unionByName(fresh))
  }

  def bigramLm(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, rareMax: Long): org.apache.spark.sql.DataFrame = {
    // pairs feeds the corpus model (bi -> uni) AND the per-doc scoring
    // join; scope-persisted so the tokenize+explode runs once, not
    // three times (rename chains defeat ReuseExchange here)
    val pairs = graft.util.CacheScope.persist(
      bigramPairs(docs, idCol, textCol))
    val bi = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    // unigram counts as bigram-LHS occurrences (Σ_b c(a,b)), so
    // P(w2|w1) = c(w1,w2)/c(w1,·) sums to 1 per w1 by construction
    val uni = bi.groupBy(col("w1")).agg(sum(col("c_ab")).as("c_a"))
    val scored = pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count_distinct(col("w1"), col("w2")).as("n_distinct_bigrams"),
        sum(when(col("c_ab") <= rareMax, 1L).otherwise(0L)).as("n_rare"),
        avg(log2(col("c_a")) - log2(col("c_ab"))).as("entropy"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"),
        (coalesce(col("entropy"), lit(0.0)) >= 0.0 &&
          coalesce(col("entropy"), lit(0.0)) <= 40.0).as("entropy_ok"))
  }

  /** Deterministic token masking for denoising/MLM-style training
    * data: token i of document d masks to `[MASK]` iff
    * md5(d ':' i) % 100 < pct — NO RNG, so the corruption is
    * reproducible run-to-run, append-stable, and bit-identical in any
    * engine (the q44/q83 hash-membership discipline applied to
    * positions). Entirely map-side: one `transform` over the
    * whitespace-split token array (the per-element md5 is genuinely
    * positional — there is no subexpression to hoist), no shuffle, no
    * UDF. Output: (id, n_tokens, n_masked, masked_text).
    *
    * Masking rides the 1-based position so the oracle's
    * generate_series(1, len) indexes align; the mask key includes the
    * document id so identical sentences in different docs mask
    * differently (no cross-doc correlation artifacts in training).
    * Empty/whitespace-only documents count 0 tokens and emit empty
    * masked_text — the [[tokenCount]] convention (a bare split would
    * yield [''] = 1 phantom token, and a doc whose whole text is
    * `[MASK]` would poison downstream token accounting). */
  def maskTokens(docs: DataFrame, idCol: String, textCol: String,
      pct: Int): DataFrame = {
    val words = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val posHash = (i: Column) => conv(substring(md5(concat(
      col(idCol).cast("string"), lit(":"), i.cast("string"))),
      1, 15), 16, 10).cast("long") % 100
    val masked = transform(col("__w"),
      (w, i) => when(posHash(i + 1) < pct, lit("[MASK]")).otherwise(w))
    docs
      .withColumn("__w", words)
      .withColumn("__m", masked)
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        size(filter(col("__m"), _ === "[MASK]")).cast("long")
          .as("n_masked"),
        array_join(col("__m"), " ").as("masked_text"))
  }

  /** Intra-document repeated-sentence removal: split on '.', trim,
    * drop empties, keep each distinct sentence's FIRST occurrence in
    * order, reassemble — the line-dedup pass that strips the
    * navigation stanza a crawler pasted three times into one page
    * (the within-doc sibling of corpus-level dedup; Gopher-class
    * repetition SCORING is [[repetitionStats]], this is the repair).
    * Entirely in-row: `array_distinct` preserves first-occurrence
    * order, so the whole pass is three codegen'd array expressions,
    * no shuffle, no UDF. Docs with no non-empty sentence (empty or
    * punctuation-free-and-blank text) emit nothing — the caller
    * unions them back untouched if passthrough is wanted. Output:
    * (id, n_sents, n_removed, clean_text). */
  def dedupSentences(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .withColumn("__sents", expr(
        s"filter(transform(split(`$textCol`, '\\\\.'), s -> trim(s)), " +
          "x -> x != '')"))
      .filter(size(col("__sents")) > 0)
      .withColumn("__kept", array_distinct(col("__sents")))
      .select(col(idCol),
        size(col("__sents")).cast("long").as("n_sents"),
        (size(col("__sents")) - size(col("__kept"))).cast("long")
          .as("n_removed"),
        array_join(col("__kept"), ". ").as("clean_text"))

  /** Redacted text: emails, then URLs, then 3+ digit runs replaced by
    * typed placeholder tokens — order matters (an email scrub must not
    * leave digits for the number scrub to re-hit differently than the
    * oracle's identical chain). */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRegex, "<EMAIL>"),
        UrlRegex, "<URL>"),
      NumRunRegex, "<NUM>")

  /** Top-k most frequent tokens per group — per-language induced
    * stopwords, the vocabulary census that seeds boilerplate scrubbing
    * and mixture diagnostics. Output: (groupCol, token, cnt, rnk).
    *
    * Scale shape: the (group, token) counts partial-combine map-side
    * (the exchange carries ≤ |vocab|·|groups| combined rows per task,
    * not the token stream) and the per-group top-k prunes via
    * WindowGroupLimit — nothing vocabulary-wide is globally sorted.
    * When |vocab|·|groups| itself outgrows the aggregation state,
    * swap the exact counts for [[Sketch.cmsHeavyHitters]] run per
    * group — same output contract, sketch-bounded state. */
  def topTokensPerGroup(docs: DataFrame, groupCol: String,
      textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol),
        explode(graft.operators.Dedup.words(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("token").asc)
    counts
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("token"), col("cnt"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Corpus-wide top-`n` vocabulary census over the normalized word
    * stream: (token, cnt). Ties at the cut broken token-ascending so
    * the vocabulary is DETERMINISTIC — a coverage number computed today
    * must reproduce tomorrow, and a count-only order would let two
    * equal-frequency tokens swap across the boundary between runs.
    *
    * Scale shape: token counts partial-combine map-side (the exchange
    * carries per-task combined (token, cnt) rows, not the token
    * stream), and the global top-n is TakeOrderedAndProject — a bounded
    * n-row heap per task fanned into one n-row result, never a
    * corpus-wide sort. The result is n rows by construction, which is
    * what lets [[oovStats]] broadcast it. */
  def vocabTopN(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .select(explode(graft.operators.Dedup.words(col(textCol)))
        .as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(n)

  /** Per-document vocabulary coverage against a bounded vocabulary —
    * the tokenizer-coverage QA step before training: a mixture whose
    * documents are full of out-of-vocabulary tokens will fragment into
    * byte-fallback pieces and waste context budget. Output per doc:
    * n_tokens, n_oov (tokens outside `vocab`), and a `well_covered`
    * flag (n_oov ≤ oovPctMax% of n_tokens, integer arithmetic —
    * n_oov·100 ≤ max·n_tokens — so the gate hashes no floats).
    * Documents with no tokens report (0, 0, true).
    *
    * Scale shape: `vocab` is bounded (top-n census or a fixed tokenizer
    * vocabulary) and broadcasts; the corpus scans ONCE, the token→vocab
    * probe is a broadcast hash join, and the only exchange is the
    * per-doc count aggregation keyed by `idCol` (partial-combined
    * map-side). Nothing corpus-wide sorts. */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, oovPctMax: Int = 10): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(graft.operators.Dedup.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val flagged = toks.join(
      broadcast(vocab.select(col("token"), lit(true).as("__in_vocab"))),
      Seq("token"), "left")
    val per = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("__in_vocab").isNull, lit(1L)).otherwise(lit(0L)))
        .as("n_oov"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("well_covered",
        col("n_oov") * lit(100L) <= lit(oovPctMax.toLong) * col("n_tokens"))
  }
}
