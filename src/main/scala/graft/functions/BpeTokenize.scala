package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact greedy BPE token count over a PINNED merges table, as a native
  * expression (no UDF: stays inside whole-stage codegen via a static
  * call, zero serialization).
  *
  * Semantics (the contract both engines implement):
  *  1. lowercase, then split the text into words on runs of
  *     `[^a-z0-9]+` (anything else is a hard token boundary);
  *  2. a word starts as its character symbols;
  *  3. each merge `(a, b)` from [[BpeTokenizer.merges]] is applied IN
  *     TABLE ORDER, exhaustively, left-to-right, non-overlapping:
  *     scan the symbol array once, fusing every adjacent `(a, b)` pair
  *     (a fused pair cannot immediately re-fuse with the next symbol in
  *     the same pass — the scan resumes after the pair);
  *  4. the token count is the number of surviving symbols.
  *
  * This is canonical sequential-merge BPE encoding (the apply-in-
  * training-order formulation); the merges table here is a fixed
  * fixture, not a trained vocabulary — the operator's value is the
  * exact mechanism, with [[graft.operators.TextAnalysis.bpeTokenEstimate]]
  * remaining the documented O(1)-per-row estimate for when a count
  * heuristic is enough.
  *
  * == Oracle twin ==
  * The DuckDB oracle is GENERATED from the same merges table
  * ([[BpeTokenizer.oracleCountSql]]), so the two sides cannot drift
  * apart silently. Equivalence rests on the `<sym>` encoding: every
  * symbol is wrapped in angle brackets (characters outside the
  * alphabet), so `replace(s, '<a><b>', '<ab>')` can only match a
  * complete adjacent symbol pair — never a fragment of a longer symbol
  * (mid-symbol starts/ends are blocked by the brackets) — and
  * occurrences can never share characters, so plain left-to-right
  * `replace` IS the pass of step 3. BpeTokenizerSpec asserts the
  * array form against an in-Spark replace-chain on adversarial
  * fixtures (adjacent repeats, symbol-prefix traps) and on corpus text.
  */
/** The document's full BPE symbol stream under the pinned merges —
  * per word the canonical sequential-merge encoding, word boundaries
  * as a `|` marker symbol (outside the `[a-z0-9]` symbol alphabet, so
  * it can never collide with a merge output). The input to the BPE
  * TRAINING step: adjacent symbol pairs within words, counted
  * corpus-wide, rank the next merge candidates — see
  * `TextAnalysis.bpeMergeCensus`. Boundary runs (any non-alphabet
  * run, including leading/trailing) collapse to ONE marker, exactly
  * like the oracle generator's `[^a-z0-9]+ -> '|'` replace. */
case class BpeSymbolStream(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "bpe_symbol_stream"

  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.symbolStream(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeTokenizer.symbolStream($t);")

  override protected def withNewChildInternal(newChild: Expression): BpeSymbolStream =
    copy(child = newChild)
}

case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeTokenizer.countTokens($t.toString());")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenizer {

  /** The pinned merges table, applied in order. Each side is a symbol
    * over `[a-z0-9]` (single chars or the result of an earlier merge).
    * Order matters: `th e -> the` only fires after `t h -> th`. A
    * fixture modelled on this corpus's vocabulary — swap in a trained
    * table for a real deployment; every consumer (expression, oracle
    * SQL, specs) reads THIS list. */
  val merges: Vector[(String, String)] = Vector(
    // generic frequent pairs (several word chains below consume their
    // outputs; order within this block is load-bearing — e.g. `d a`
    // must precede `a t` or "data" stalls at [d, at, a])
    "t" -> "h", "th" -> "e", // the
    "a" -> "n", "i" -> "n", "o" -> "n", "e" -> "r", "r" -> "e",
    "d" -> "a", "da" -> "t", "dat" -> "a", // data
    "a" -> "t", "s" -> "t", "a" -> "r", "o" -> "r", "l" -> "e",
    "o" -> "w",
    // word chains over this corpus's vocabulary
    "t" -> "a", "ta" -> "b", "tab" -> "le", // table
    "v" -> "a", "va" -> "l", "val" -> "u", "valu" -> "e", // value
    "r" -> "ow", // row
    "s" -> "c", "sc" -> "an", // scan
    "h" -> "a", "ha" -> "s", "has" -> "h", // hash
    "f" -> "a", "fa" -> "st", // fast
    "s" -> "l", "sl" -> "ow", // slow
    "k" -> "e", "ke" -> "y", // key
    "j" -> "o", "jo" -> "in", // join
    "w" -> "in", "win" -> "d", "wind" -> "ow", // window
    "q" -> "u", "qu" -> "er", "quer" -> "y", // query
    "s" -> "m", "sm" -> "a", "sma" -> "l", "smal" -> "l", // small
    "s" -> "p", "sp" -> "ar", "spar" -> "k", // spark (before `p ar`)
    "p" -> "ar", "par" -> "t", // part
    "b" -> "at", "bat" -> "c", "batc" -> "h", // batch
    "a" -> "g", "ag" -> "g", // agg
    "c" -> "o", "co" -> "l", "col" -> "u", "colu" -> "m", "colum" -> "n",
    "or" -> "d", "ord" -> "er", // order
    "l" -> "in", "lin" -> "e" // line
  )

  require(merges.forall { case (a, b) =>
    (a + b).forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
  }, "merge symbols must stay inside the [a-z0-9] alphabet — the " +
    "boundary marker and the oracle's bracket encoding depend on it")

  /** Canonical sequential-merge encoding of one word (already
    * lowercase, alphabet chars only). One scan per merge; a merge with
    * no occurrence allocates nothing. */
  def encodeWord(word: String): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val (a, b) = merges(m)
      // locate the first occurrence before allocating anything
      var first = -1
      var j = 0
      while (first < 0 && j < syms.length - 1) {
        if (syms(j).equals(a) && syms(j + 1).equals(b)) first = j else j += 1
      }
      if (first >= 0) {
        val out = new java.util.ArrayList[String](syms.length - 1)
        var k = 0
        while (k < first) { out.add(syms(k)); k += 1 }
        val fused = a + b
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k).equals(a) && syms(k + 1).equals(b)) {
            out.add(fused); k += 2
          } else { out.add(syms(k)); k += 1 }
        }
        syms = out.toArray(new Array[String](out.size()))
      }
      m += 1
    }
    syms
  }

  /** Tokens in one word — via a small per-thread memo: a corpus's word
    * distribution is Zipfian, so most lookups hit. Bounded (cleared at
    * 1 << 15 entries) so a pathological vocabulary cannot grow driver
    * or executor heaps. */
  private val memo = new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
    override def initialValue() = new java.util.HashMap[String, java.lang.Long]()
  }

  def countWordTokens(word: String): Long = {
    val m = memo.get()
    val hit = m.get(word)
    if (hit != null) hit.longValue()
    else {
      val n = encodeWord(word).length.toLong
      if (m.size() >= (1 << 15)) m.clear()
      m.put(word, n)
      n
    }
  }

  /** Per-word symbol-ARRAY memo, the sibling of [[countWordTokens]]'s
    * count memo (Zipfian hit rate, same 1 << 15 bound). Arrays are
    * shared across rows but never mutated after insertion. */
  private val memoSyms =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() =
        new java.util.HashMap[String, Array[String]]()
    }

  private def wordSymbols(word: String): Array[String] = {
    val m = memoSyms.get()
    val hit = m.get(word)
    if (hit != null) hit
    else {
      val syms = encodeWord(word)
      if (m.size() >= (1 << 15)) m.clear()
      m.put(word, syms)
      syms
    }
  }

  private val Boundary =
    org.apache.spark.unsafe.types.UTF8String.fromString("|")

  /** The document's symbol stream as an ArrayData (see
    * [[BpeSymbolStream]]). Static so generated code calls it
    * directly. */
  def symbolStream(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val lower = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new java.util.ArrayList[Object]()
    var i = 0
    val n = lower.length
    while (i < n) {
      if (!isAlpha(lower.charAt(i))) {
        while (i < n && !isAlpha(lower.charAt(i))) i += 1
        out.add(Boundary)
      } else {
        val start = i
        while (i < n && isAlpha(lower.charAt(i))) i += 1
        val syms = wordSymbols(lower.substring(start, i))
        var k = 0
        while (k < syms.length) {
          out.add(org.apache.spark.unsafe.types.UTF8String
            .fromString(syms(k)))
          k += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Total BPE tokens of a document: lowercase, split on non-alphabet
    * runs, sum per-word counts. Static and JVM-primitive so generated
    * code calls it directly. */
  def countTokens(text: String): Long = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var i = 0
    val n = lower.length
    while (i < n) {
      // skip a boundary run
      while (i < n && !isAlpha(lower.charAt(i))) i += 1
      val start = i
      while (i < n && isAlpha(lower.charAt(i))) i += 1
      if (i > start) total += countWordTokens(lower.substring(start, i))
    }
    total
  }

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** The symbol stream of `textExpr` as one DuckDB SQL expression,
    * generated from [[merges]]: lowercase, non-alphabet runs to a `|`
    * boundary marker, every char wrapped `<c>`, then one `replace` per
    * merge in table order — each side is a complete symbol by the time
    * its merge runs, so the pattern is the two wrapped symbols. Bind it
    * to an alias in a subquery and count with
    * [[oracleCountFromSymbolsSql]] (inlining it three times for the
    * count arithmetic would cube the SQL size). */
  def oracleSymbolStreamSql(textExpr: String): String = {
    val wrapped =
      raw"regexp_replace(regexp_replace(lower($textExpr), '[^a-z0-9]+', '|', 'g'), '(.)', '<\1>', 'g')"
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, '<$a><$b>', '<$a$b>')"
    }
  }

  /** Token count over a bound symbol-stream column: `<` occurrences
    * (one per symbol) minus boundary markers (`<|>`, 3 chars each).
    * BIGINT on both engines. */
  def oracleCountFromSymbolsSql(sCol: String): String =
    s"CAST(length($sCol) - length(replace($sCol, '<', '')) - " +
      s"(length($sCol) - length(replace($sCol, '<|>', ''))) // 3 AS BIGINT)"

  /** The FULL BPE-training loop as one DuckDB query — the SQL twin of
    * `TextAnalysis.bpeTrain(docs, textCol, rounds)`, with the
    * data-dependent merge choices expressed IN SQL rather than
    * generated from a pinned table: `rounds` unrolled stages, each a
    * (census → top-1 → fuse) triple of CTEs, where the fuse's
    * `replace` pattern is built from the 1-row top-1 CTE by string
    * concatenation (a 1-row cross join, the scalar-subquery idiom).
    * Both sides start from the bare-character bracket stream (no
    * pinned merges — training from scratch) and share the census's
    * (cnt DESC, sym_a, sym_b) total order, so the adopted tables are
    * identical row-for-row. */
  def oracleTrainSql(rounds: Int, table: String, textCol: String): String =
    trainCtes(rounds, table, textCol, idCol = None) + "\n" +
      (1 to rounds)
        .map(i =>
          s"SELECT CAST($i AS INTEGER) AS round, sym_a, sym_b, cnt FROM b$i")
        .mkString("", "\nUNION ALL\n", "\nORDER BY round")

  /** Training UNROLLED plus the APPLY: after the `rounds` fuse stages,
    * count each document's surviving symbols — the SQL twin of
    * `TextAnalysis.bpeTrainAndTokenize` (train a tokenizer from the
    * corpus, then tokenize the corpus with it, one gated query). */
  def oracleTrainAndCountSql(rounds: Int, table: String, textCol: String,
      idCol: String): String =
    trainCtes(rounds, table, textCol, idCol = Some(idCol)) + s"""
      SELECT $idCol, ${oracleCountFromSymbolsSql("s")} AS n_tokens_trained
      FROM s$rounds ORDER BY $idCol"""

  /** The shared unrolled (census → top-1 → fuse) CTE chain. With
    * `idCol` set, the stream CTEs carry the id so the final stage can
    * emit per-document results; the census CTEs ignore it either
    * way. The fuse stage is a LEFT JOIN against the 1-row top-1 CTE
    * with a CASE passthrough: if the census EXHAUSTS before `rounds`
    * (fewer possible merges than rounds), b_i is empty and a plain
    * cross join would empty every later stream CTE — silently zeroing
    * oracleTrainAndCountSql's per-doc rows while the engine still
    * emits one row per document under the partial merge table. The
    * passthrough keeps the stream flowing unfused, matching the
    * engine's early-stop semantics exactly. */
  private def trainCtes(rounds: Int, table: String, textCol: String,
      idCol: Option[String]): String = {
    require(rounds >= 1)
    val base =
      raw"regexp_replace(regexp_replace(lower($textCol), '[^a-z0-9]+', '|', 'g'), '(.)', '<\1>', 'g')"
    val idSel = idCol.map(c => s"$c, ").getOrElse("")
    val sb = new StringBuilder
    sb.append(s"WITH s0 AS (SELECT $idSel$base AS s FROM $table)")
    for (i <- 1 to rounds) {
      val prev = s"s${i - 1}"
      sb.append(s""",
      c$i AS (
        SELECT a[j] AS sym_a, a[j + 1] AS sym_b, COUNT(*) AS cnt
        FROM (SELECT regexp_extract_all(s, '<([^<>]*)>', 1) AS a FROM $prev),
             UNNEST(generate_series(1, len(a) - 1)) t(j)
        WHERE len(a) >= 2 AND a[j] <> '|' AND a[j + 1] <> '|'
        GROUP BY 1, 2),
      b$i AS (
        SELECT sym_a, sym_b, cnt FROM c$i
        ORDER BY cnt DESC, sym_a ASC, sym_b ASC LIMIT 1),
      s$i AS (
        SELECT ${idSel}CASE WHEN b.sym_a IS NULL THEN s
                 ELSE replace(s, '<' || b.sym_a || '><' || b.sym_b || '>',
                              '<' || b.sym_a || b.sym_b || '>') END AS s
        FROM $prev LEFT JOIN b$i b ON TRUE)""")
    }
    sb.toString
  }
}
