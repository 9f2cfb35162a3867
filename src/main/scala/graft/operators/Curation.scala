package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal (the CCNet/C4 idea: content that
  * repeats across a large fraction of documents is template noise, not
  * signal). This corpus has no line structure, so the unit is the WORD:
  * any word present in more than `thrNum/thrDen` of all documents is
  * boilerplate vocabulary and is scrubbed from every document.
  *
  * Scale design: the document-frequency table is vocabulary-sized
  * (tiny next to the corpus) and the boilerplate list is folded to ONE
  * row; both fan back onto the corpus as constant-size broadcast
  * builds (the q68/q20/q36 audited-exception class — cost linear in
  * corpus, zero corpus-side shuffle). The corpus text is scanned twice
  * (once to count, once to scrub) and shuffled never; the only
  * exchange is the vocabulary-sized document-frequency aggregation,
  * which map-side combines to ≤ |vocab| rows per partition.
  */
object Curation {

  /** Document frequency per word: (word, df) where df counts DISTINCT
    * documents containing the word (array_distinct before explode —
    * in-row, so a word repeated within one doc still counts once and
    * the exploded row count is bounded by |vocab| per doc). */
  def wordDocFrequency(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(Dedup.words(col(textCol)))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"))

  /** Scrub words with df/ndocs > thrNum/thrDen from every document
    * (integer cross-multiplication — no float threshold to diverge
    * between engines). Output per document: doc_id, n_before, n_after,
    * clean_text (space-rejoined surviving words, original order). */
  def scrubBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      thrNum: Int, thrDen: Int): DataFrame = {
    val dfreq = wordDocFrequency(docs, idCol, textCol)
    val total = docs.agg(count(lit(1)).as("ndocs"))
    val boiler = dfreq.crossJoin(broadcast(total))
      .filter(col("df") * thrDen > col("ndocs") * thrNum)
      .agg(sort_array(collect_list(col("word"))).as("bw"))
    docs
      .select(col(idCol).as("doc_id"),
        Dedup.words(col(textCol)).as("__w"))
      .crossJoin(broadcast(boiler))
      .select(col("doc_id"), col("__w"),
        filter(col("__w"), x => not(array_contains(col("bw"), x)))
          .as("__kept"))
      .select(col("doc_id"),
        size(col("__w")).cast("bigint").as("n_before"),
        size(col("__kept")).cast("bigint").as("n_after"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** Registered host of a URL, lowercased: scheme, optional userinfo,
    * and port/path/query/fragment stripped. A single regexp_extract so
    * the oracle can run the IDENTICAL pattern (the char classes are
    * Java-regex ∩ RE2 — no lookarounds, no shorthand classes). NULL
    * scheme-less / malformed inputs yield an empty string (regexp's
    * no-match value on both engines), which downstream quota/blocklist
    * logic treats as its own bucket rather than dropping silently. */
  def extractHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** URL canonicalization chain for URL-LEVEL dedup — the step a crawl
    * pipeline runs before content fetch/dedup, collapsing the aliases
    * that make one page look like many (case in scheme/host, default
    * ports, fragments, userinfo, tracking parameters, trailing slash).
    * All pieces are Java-regex ∩ RE2 (no lookarounds) with LITERAL
    * replacements only, so the DuckDB oracle runs the same chain
    * verbatim (the q62/q113 shared-constant discipline; Spark's `$1`
    * vs DuckDB's `\1` replacement syntax never comes up).
    *
    * Chain: strip the fragment ([[UrlFragmentRe]]) → split at the
    * [[UrlPrefixRe]] scheme://authority boundary → within the AUTHORITY
    * PREFIX ONLY, drop userinfo ([[UrlUserinfoRe]]), lowercase, and
    * strip the scheme's own default port ([[UrlHttpPortRe]] under
    * http://, [[UrlHttpsPortRe]] under https:// — :8080, or :443 under
    * http://, is page identity and survives) → re-concatenate with the
    * path/query remainder → [[UrlCanonPost]]. Authority-scoping the
    * userinfo/port rules means a query VALUE like `?next=http://u@h`
    * or a path segment `:80/` is never rewritten. URLs with no
    * scheme://authority prefix (relative/schemeless) pass through
    * un-lowered — every such URL keeps its own identity rather than
    * collapsing into one empty-string canon — and still get the
    * [[UrlCanonPost]] tracking-parameter hygiene. */
  val UrlFragmentRe = "#.*$"          // fragment never reaches the server
  val UrlUserinfoRe = "://[^/?#@]*@"  // userinfo is not page identity
  /** Group 1 = scheme://[userinfo@]host[:port], group 2 = rest. */
  val UrlPrefixRe = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(.*)$"
  /** Default-port strips, applied to the authority prefix only (which
    * contains no `/`, so a single `$`-anchored pattern suffices). */
  val UrlHttpPortRe = ":80$"
  val UrlHttpsPortRe = ":443$"
  val UrlCanonPost: Seq[(String, String)] = Seq(
    "&(utm_[a-zA-Z0-9]+|gclid|fbclid)=[^&#]*" -> "",    // mid/terminal &
    "\\?(utm_[a-zA-Z0-9]+|gclid|fbclid)=[^&#]*&" -> "?", // first of many
    "\\?(utm_[a-zA-Z0-9]+|gclid|fbclid)=[^&#]*$" -> "",  // only param
    "[?&]$" -> "",                     // tidy a now-empty query
    "/$" -> "")                        // trailing slash

  /** Apply the canonicalization chain. The prefix is extracted twice
    * (authority + remainder) and the authority re-derived per CASE arm;
    * bind the input to a column first when this runs in a hot loop so
    * the upstream expression isn't re-evaluated. */
  def canonicalizeUrl(url: Column): Column = {
    val pre = regexp_replace(url, UrlFragmentRe, "")
    val g1 = regexp_extract(pre, UrlPrefixRe, 1)
    val g2 = regexp_extract(pre, UrlPrefixRe, 2)
    val auth = lower(regexp_replace(g1, UrlUserinfoRe, "://"))
    val authPort =
      when(auth.startsWith("http://"), regexp_replace(auth, UrlHttpPortRe, ""))
        .when(auth.startsWith("https://"), regexp_replace(auth, UrlHttpsPortRe, ""))
        .otherwise(auth)
    val base = when(g1 === lit(""), pre).otherwise(concat(authPort, g2))
    UrlCanonPost.foldLeft(base) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
  }

  /** Per-host document quota: keep the `perHost` hash-smallest docs of
    * each host — the per-group-cap discipline of the reference's
    * top-200-per-region chart (spotify_eps.py:75), applied to the
    * pretraining-corpus problem of a few giant domains swamping the
    * mixture. Deterministic (md5 order, id tie-break), and the plan is
    * a WindowGroupLimit per host group — no corpus-wide sort, the
    * hosts shuffle once on the partition key. */
  def hostQuota(docs: DataFrame, hostCol: String, idCol: String,
      perHost: Int): DataFrame =
    Sampling.stratifiedSample(docs, hostCol, idCol, perHost)

  /** Per-host TOKEN budget: within each host, admit documents in
    * quality order (best first, id tie-break) until the host's
    * cumulative token count crosses `budgetTokens` — the
    * proportional-curation refinement of [[hostQuota]]'s flat doc cap
    * (a giant domain of one-line pages and one of book-length pages
    * get the same token mass, not the same doc count). Emits every
    * doc with its running total and verdict so the caller can audit
    * the cut line; `filter(kept)` is the curated corpus.
    *
    * Scale — SALT-SLICED running sum, the [[Sampling]] rangedCumSum
    * two-pass discipline applied WITHIN host so a mega-host (a large
    * site at web scale: tens of millions of rows) never serializes on
    * one window task:
    *
    *  1. slice = (host, quality) — contiguous under the (quality DESC,
    *     id ASC) admission order by construction, so a per-slice
    *     running sum (window partitioned by the SLICE, ordered by id)
    *     is the order-correct local prefix; the mega-host spreads
    *     across as many tasks as it has distinct quality values;
    *  2. per-slice token subtotals aggregate over the SAME slice-keyed
    *     exchange: the repartitioned input is CacheScope-persisted so
    *     both branches read one materialization (a naive two-branch
    *     build re-evaluates every upstream quality/token expression
    *     per branch, doubling the corpus scan — and ReuseExchange
    *     cannot dedup the exchanges because column pruning gives each
    *     branch a different projection; the cache preserves the hash
    *     partitioning, so neither branch re-shuffles) and expand
    *     to each slice's OFFSET — the token mass of all
    *     strictly-better-quality slices of the same host — via a
    *     window over the subtotal frame (per-host rows there =
    *     distinct quality values, bounded and tiny);
    *  3. offsets fan back by a slice-keyed equi-join (runtime-small →
    *     AQE broadcasts it; the probe side keeps its partitioning) and
    *     cum = local + offset. The slice key is a STRUCT of (host,
    *     quality) so null host/quality rows group and join exactly as
    *     the single-window form ordered them (struct equality treats
    *     null fields as equal; plain `===` on the raw columns would
    *     drop those rows).
    *
    * Same numbers as the single host-partitioned window (the offset is
    * exactly the sum of all order-earlier rows in other slices), so
    * the DuckDB oracle keeps the readable one-window SQL.
    *
    * DEGENERATE-QUALITY fallback (coded, not prose): a mega-host
    * whose rows share ONE quality value lands in one slice and would
    * serialize that slice's window on a single task. A cheap
    * slice-census probe (map-side combined — the exchange carries
    * slice keys, never rows) checks whether any slice exceeds
    * `sliceRowBound`; if so, the whole computation switches to a
    * RANGE-CHUNKED three-level form: rows range-partition on
    * (slice, id) — contiguous in the admission order by construction
    * — each chunk computes its local prefix (window partitioned by
    * (slice, chunk): no task sees more than a chunk), chunk subtotals
    * roll up to per-slice chunk offsets, and slice subtotals fan back
    * through the same per-host offset window. Identical values (all
    * integer sums, decomposition-transparent); the price is one extra
    * corpus exchange, paid only when the probe says the one-window-
    * per-slice form would serialize.
    *
    * The probe is an eager per-call action (one map-side-combined
    * count scan); a caller that KNOWS its slices are bounded —
    * steady-state daily runs over audited corpora — opts out by
    * passing `sliceRowBound = Long.MaxValue`, which skips the probe
    * entirely (no slice can exceed an unbounded bound) and always
    * takes the common lane. */
  def hostTokenBudget(docs: DataFrame, hostCol: String, idCol: String,
      tokensCol: String, qualityCol: String, budgetTokens: Long,
      sliceRowBound: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the bound sizes the ranged lane's chunk count (divisor below);
    // 0 would arm the lane for every nonempty slice and then divide
    // by zero — reject loudly instead of crashing mid-plan
    require(sliceRowBound > 0,
      s"sliceRowBound must be positive (Long.MaxValue disables the " +
        s"probe), got $sliceRowBound")
    // NOT persisted: each lane caches its own repartitioned `part`
    // (the frame both branches read), and persisting here too would
    // hold a second corpus-sized cache copy for the lifetime of the
    // query for at most one saved upstream scan
    val sliced = docs.withColumn("__slice",
      struct(col(hostCol).as("h"), col(qualityCol).as("q")))
    val wOff = Window.partitionBy(col("__slice.h"))
      .orderBy(col("__slice.q").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // (max slice rows, total rows) in ONE map-side-combined scan; the
    // total sizes the ranged lane's chunk count if it engages
    val probe: Option[(Long, Long)] =
      if (sliceRowBound == Long.MaxValue) None
      else {
        val r = sliced.groupBy(col("__slice"))
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(max(col("__n")), lit(0L)),
            coalesce(sum(col("__n")), lit(0L)))
          .collect()(0)
        Some((r.getLong(0), r.getLong(1)))
      }
    val degenerate = probe.exists(_._1 > sliceRowBound)
    if (!degenerate) {
      val part = sliced
        .repartition(col("__slice"))
        .transform(graft.util.CacheScope.persist)
      val wLocal = Window.partitionBy(col("__slice"))
        .orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = part.groupBy(col("__slice"))
        .agg(sum(col(tokensCol)).as("__sub"))
        .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0)))
        .select(col("__slice").as("__slice2"), col("__off"))
      part.withColumn("__local", sum(col(tokensCol)).over(wLocal))
        .join(off, col("__slice") === col("__slice2"))
        .withColumn("cum_tokens", col("__local") + col("__off"))
        .withColumn("kept", col("cum_tokens") <= budgetTokens)
        .drop("__slice", "__slice2", "__off", "__local")
    } else {
      // ranged lane: chunk = range-partition ordinal, contiguous in
      // id within each slice, so chunk-local prefix + earlier-chunk
      // subtotals + better-slice subtotals reassemble the exact
      // running sum. The chunk COUNT is data-derived from the census
      // total (RangePartitioner aims for equal row counts, so each
      // chunk carries ~sliceRowBound/2 rows) and passed EXPLICITLY —
      // a user-specified count is exempt from AQE coalescing, which
      // could otherwise merge the mega slice back into one chunk and
      // re-serialize the window the lane exists to split. The chunk
      // ORDINAL is physical-partition-derived, so the frame is
      // eagerly localCheckpoint'ed, not persisted: a persisted plan
      // can be recomputed on cache eviction, and a recompute under
      // different runtime conditions could assign different chunks
      // to the per-chunk offsets branch than the row-level window
      // saw — silently corrupting cum_tokens. A checkpoint truncates
      // lineage: the assignment CANNOT be recomputed, and a lost
      // checkpoint block is a loud task failure, never silent
      // divergence.
      // shuffle.partitions can hold a non-numeric value on some
      // platforms ("auto") — parse defensively, falling back to the
      // cluster's default parallelism rather than dying opaquely
      val confChunks = docs.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toIntOption
        .getOrElse(docs.sparkSession.sparkContext.defaultParallelism)
      val numChunks = math.max(confChunks,
        math.min(Int.MaxValue.toLong,
          2L * probe.get._2 / sliceRowBound + 1L).toInt)
      // registerCheckpointed: Dataset.unpersist cannot release
      // checkpoint blocks, so the gate harness's CacheScope drops
      // them on scope exit instead of waiting for Dataset GC
      val part = graft.util.CacheScope.registerCheckpointed(
        sliced
          .repartitionByRange(numChunks, col("__slice"), col(idCol))
          .withColumn("__chunk", spark_partition_id())
          .localCheckpoint())
      val wLocal = Window.partitionBy(col("__slice"), col("__chunk"))
        .orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wChunk = Window.partitionBy(col("__slice"))
        .orderBy(col("__chunk").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunkSub = part.groupBy(col("__slice"), col("__chunk"))
        .agg(sum(col(tokensCol)).as("__csub"))
        .transform(graft.util.CacheScope.persist)
      val chunkOff = chunkSub
        .withColumn("__coff",
          coalesce(sum(col("__csub")).over(wChunk), lit(0L)))
        .select(col("__slice").as("__slice2"),
          col("__chunk").as("__chunk2"), col("__coff"))
      val off = chunkSub.groupBy(col("__slice"))
        .agg(sum(col("__csub")).as("__sub"))
        .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0)))
        .select(col("__slice").as("__slice3"), col("__off"))
      part.withColumn("__local", sum(col(tokensCol)).over(wLocal))
        .join(chunkOff, col("__slice") === col("__slice2") &&
          col("__chunk") === col("__chunk2"))
        .join(off, col("__slice") === col("__slice3"))
        .withColumn("cum_tokens",
          col("__local") + col("__coff") + col("__off"))
        .withColumn("kept", col("cum_tokens") <= budgetTokens)
        .drop("__slice", "__slice2", "__slice3", "__chunk", "__chunk2",
          "__csub", "__coff", "__off", "__local")
    }
  }

  /** MODEL-based quality filtering: score every document under a
    * linear model whose weights live in a TABLE — the fastText-style
    * classifier-filter stage of a pretraining pipeline, where the
    * model retrains offline and ships as data (swap the weights table,
    * not the job). `weights` is (feature: string, w_micro: long) in
    * integer micro-units; `featureCols` are integer feature columns
    * already on `docs`; an optional 'bias' row applies with implicit
    * x = 1. Score = Σ w_f·x_f + bias, EXACT integer arithmetic
    * (micro × count ≤ 1e12-scale per term — far inside BIGINT), so
    * the verdict is bit-portable to the SQL oracle.
    *
    * Scale shape: the weights table folds to ONE map-typed row and
    * attaches as a scalar subquery (the q120/packContexts discipline —
    * no cross join, no BNLJ); the dot product is then a map-side,
    * codegen'd expression — scoring 100 TB shuffles NOTHING. A missing
    * weight contributes 0 (the model simply doesn't use that feature),
    * so feature-set drift between model versions degrades gracefully
    * instead of erroring the whole corpus. */
  def modelScore(docs: DataFrame, idCol: String, weights: DataFrame,
      featureCols: Seq[String], threshold: Long): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    require(featureCols.nonEmpty,
      "modelScore needs at least one feature column")
    // duplicate feature rows SUM (two rows for one feature are two
    // additive terms of the same linear model) — and, less politely,
    // a duplicated key would make map_from_arrays throw at runtime
    // under the default mapKeyDedupPolicy=EXCEPTION
    val wmap = weights
      .groupBy(col("feature")).agg(sum(col("w_micro")).as("w_micro"))
      .agg(map_from_arrays(
        collect_list(col("feature")), collect_list(col("w_micro"))).as("wm"))
    val term = (f: String) =>
      coalesce(element_at(col("__wm"), lit(f)), lit(0L))
    val dot = featureCols.map(f => term(f) * col(f).cast("long"))
      .reduce(_ + _) + term("bias")
    docs
      .withColumn("__wm",
        Bridge.column(ScalarSubquery(Bridge.analyzed(wmap))))
      .withColumn("score_micro", dot)
      .withColumn("kept", col("score_micro") >= threshold)
      .drop("__wm")
  }

  /** Template HEADER census: per (source, first-k-words prefix), how
    * many of the source's docs open identically — the positional
    * boilerplate detector ([[wordDocFrequency]]-based scrubbing finds
    * hot WORDS; this finds the "Subscribe to our newsletter"
    * TEMPLATE that crawls stamp onto every page of a site). A prefix
    * is flagged `is_template` when it covers more than 1/shareDen of
    * the source's prefixed docs (cross-multiplication, no division)
    * and at least `minDocs` docs. Two partial-combining aggregates +
    * a per-source totals fan-back; the exchange carries (source,
    * prefix) keys, never documents. Docs shorter than k words carry
    * no prefix and are excluded from both counts. */
  def templateHeaders(docs: DataFrame, srcCol: String, textCol: String,
      k: Int, shareDen: Long, minDocs: Long): DataFrame = {
    val census = templateHeaderLedger(docs, srcCol, textCol, k)
      .transform(graft.util.CacheScope.persist)
    val totals = census.groupBy(col(srcCol))
      .agg(sum(col("n_docs")).as("src_docs"))
    census.join(totals, srcCol)
      .withColumn("is_template",
        col("n_docs") * lit(shareDen) > col("src_docs") &&
          col("n_docs") >= minDocs)
  }

  /** The stored-state half of [[templateHeaders]]: the (source,
    * header, n_docs) census, which is the operator's exact sufficient
    * statistics — counts add under an append-only corpus. */
  def templateHeaderLedger(docs: DataFrame, srcCol: String,
      textCol: String, k: Int): DataFrame =
    docs
      .select(col(srcCol), Dedup.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(srcCol),
        concat_ws(" ", slice(col("__w"), 1, k)).as("header"))
      .groupBy(col(srcCol), col("header"))
      .agg(count(lit(1)).as("n_docs"))

  /** O(new)-per-day [[templateHeaders]] maintenance: the stored census
    * merges the broadcast batch census by addition, fresh (source,
    * header) keys append via a broadcast anti join (the
    * incrementalBigramCensus discipline), and totals + template
    * verdicts re-derive from the merged census — a template that
    * crosses the share threshold only after today's batch flips
    * correctly, because the flag is a VIEW over the state, not state
    * itself. History documents are never rescanned. */
  def incrementalTemplateHeaders(ledger: DataFrame, batch: DataFrame,
      srcCol: String, textCol: String, k: Int, shareDen: Long,
      minDocs: Long): DataFrame = {
    val b = templateHeaderLedger(batch, srcCol, textCol, k)
      .select(col(srcCol), col("header"), col("n_docs").as("__n_b"))
      .transform(graft.util.CacheScope.persist)
    val merged = ledger
      .join(broadcast(b), Seq(srcCol, "header"), "left")
      .select(col(srcCol), col("header"),
        (col("n_docs") + coalesce(col("__n_b"), lit(0L))).as("n_docs"))
    val fresh = b
      .join(broadcast(ledger.select(col(srcCol), col("header"))
          .join(broadcast(b.select(col(srcCol), col("header"))),
            Seq(srcCol, "header"), "left_semi")),
        Seq(srcCol, "header"), "left_anti")
      .select(col(srcCol), col("header"), col("__n_b").as("n_docs"))
    val census = merged.unionByName(fresh)
      .transform(graft.util.CacheScope.persist)
    val totals = census.groupBy(col(srcCol))
      .agg(sum(col("n_docs")).as("src_docs"))
    census.join(totals, srcCol)
      .withColumn("is_template",
        col("n_docs") * lit(shareDen) > col("src_docs") &&
          col("n_docs") >= minDocs)
  }

  /** Drop documents whose host is on a blocklist — broadcast ANTI-join
    * rather than `isin`: a production blocklist is a table of thousands
    * of hosts that ships to executors once, not a literal baked into
    * the plan. The blocklist side is deduplicated defensively (a dup
    * in a blocklist must not drop extra rows — anti-join semantics
    * guarantee that, the distinct just keeps the broadcast minimal). */
  def hostBlocklistFilter(docs: DataFrame, hostCol: String,
      blocklist: DataFrame, blockHostCol: String): DataFrame =
    docs.join(
      broadcast(blocklist.select(col(blockHostCol).as("__blocked")).distinct()),
      col(hostCol) === col("__blocked"), "left_anti")

  /** Domain-level quality curation — the Gopher/C4-style "judge the
    * host, not just the page" pass: a spam domain's individually-
    * plausible pages all drop together once the DOMAIN's mean quality
    * is low, and a reputable domain's occasional short page survives.
    * Per host, the mean of the per-document quality score is computed
    * in integer MICRO-units (`qMicroCol`, the
    * [[TextAnalysis.qualityMicro]] scale) as `sum DIV count` — integer
    * floor division, so the host mean is exact and engine-portable
    * (a double mean's value depends on partial-sum order, which no
    * hash gate can pin). Every document comes back annotated with its
    * host's mean and a `kept` flag (mean ≥ `minMeanMicro`) — the full
    * ledger, so the drop decision is auditable per host.
    *
    * Scale shape: pass 1 is a partial-combining aggregate to ≤ |hosts|
    * rows (two longs each); pass 2 fans the host frame back with a
    * plain equi-join the optimizer sizes itself — at sf the host frame
    * broadcasts, at 100 TB with hundreds of millions of hosts AQE
    * picks a shuffled hash join on the host key, which is the right
    * plan there (no hint pinned, deliberately). */
  def domainQualityReport(docs: DataFrame, hostCol: String,
      qMicroCol: String, minMeanMicro: Long): DataFrame = {
    val hostStats = docs
      .groupBy(col(hostCol))
      .agg(sum(col(qMicroCol)).as("__qsum"), count(lit(1)).as("__qn"))
      .select(col(hostCol),
        expr("__qsum DIV __qn").as("host_q_micro"))
    docs.join(hostStats, Seq(hostCol))
      .withColumn("kept", col("host_q_micro") >= minMeanMicro)
  }

  /** The stored artifact [[domainQualityIncremental]] maintains: one
    * (host, q_sum, n_docs) row per host — the sufficient statistic for
    * the exact integer mean, which is what makes the daily update
    * O(new): sums add, counts add, the mean re-derives. */
  def domainQualityLedger(docs: DataFrame, hostCol: String,
      qMicroCol: String): DataFrame =
    docs.groupBy(col(hostCol))
      .agg(sum(col(qMicroCol)).as("q_sum"),
        count(lit(1)).as("n_docs"))

  /** O(new)-per-day sibling of [[domainQualityReport]], the
    * q65/q108/q116/q132 incremental-family discipline applied to
    * domain curation: yesterday's [[domainQualityLedger]] merges with
    * today's batch by pure addition (the integer micro-unit mean is
    * exactly mergeable — a double mean would not be), and every host's
    * verdict re-evaluates against the UPDATED mean, so a good host
    * that degrades (or a spam host that launders itself with good
    * pages) flips verdicts corpus-consistently. Output is the new
    * ledger + verdicts — (host, q_sum, n_docs, host_q_micro, kept) —
    * which IS tomorrow's input: the operator is self-maintaining.
    *
    * Scale shape: the batch aggregates to ≤ |batch hosts| rows
    * map-side; the merge is a union + re-aggregate on the host key —
    * both frames are host-sized, not corpus-sized, so the daily cost
    * never touches history documents. */
  def domainQualityIncremental(ledger: DataFrame, batch: DataFrame,
      hostCol: String, qMicroCol: String,
      minMeanMicro: Long): DataFrame = {
    val b = domainQualityLedger(batch, hostCol, qMicroCol)
    ledger.select(col(hostCol), col("q_sum"), col("n_docs"))
      .unionByName(b)
      .groupBy(col(hostCol))
      .agg(sum(col("q_sum")).as("q_sum"),
        sum(col("n_docs")).cast("long").as("n_docs"))
      .withColumn("host_q_micro", expr("q_sum DIV n_docs"))
      .withColumn("kept", col("host_q_micro") >= minMeanMicro)
  }

  /** Unicode normalization for crawl text: strip invisible junk
    * (controls, zero-widths, BOM) and compose to NFC, so that
    * fingerprint-based dedup sees "é" and "e"+combining-acute as the
    * SAME text. Native codegen'd expression
    * ([[graft.functions.NormalizeText]]) — zero shuffle, runs in-row
    * inside whole-stage codegen ahead of any fingerprint/shingle step. */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.NormalizeText(Bridge.expression(text)))
  }
}
