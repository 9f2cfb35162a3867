package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The signed pair-census DELTA of fusing every `<a><b>` occurrence in
  * one bracket-encoded BPE symbol stream — the per-document kernel of
  * `TextAnalysis.bpeTrain`'s incremental census: rows (sym_a, sym_b,
  * ±1) such that census(fused doc) = census(doc) ⊎ delta, exactly.
  *
  * Why native: the declarative form (`split` on the pattern + two
  * anchored regexes per junction) allocates every affected document as
  * part strings each round — O(corpus) allocation for O(occurrences)
  * information. This expression walks `indexOf` occurrence to
  * occurrence, reads each junction's neighbor symbols by bracket scan,
  * and allocates only the ≤ 5 output rows per occurrence. Codegen'd
  * via a static call, zero serialization, same class as
  * [[BpeSymbolStream]].
  *
  * Junction algebra (proved delta ≡ full-recount in
  * BpeTokenizerSpec): an occurrence at `idx` loses its own (a, b)
  * pair; its LEFT neighbor pair flips from (L, a) to (L, ab) — where
  * L is the previous occurrence's fusion product when that occurrence
  * abuts directly (`prevEnd == idx`: the (b, a)→(ab, ab) chain case),
  * absent at stream start; its RIGHT neighbor pair flips from (b, R)
  * to (ab, R) only when a non-occurrence symbol follows — a directly
  * following occurrence is THAT junction's chain-left (no double
  * count), stream end has no neighbor. Pairs touching the `|`
  * boundary marker are skipped on both signs, mirroring the census's
  * within-word rule. `indexOf` advancing by pattern length IS
  * leftmost non-overlapping matching — the same semantics as the
  * `replace` fuse the delta describes. */
case class BpeCensusDeltaExpr(child: Expression, symA: String,
    symB: String) extends UnaryExpression {

  override def dataType: DataType = BpeCensusDelta.Shape

  override def prettyName: String = "bpe_census_delta"

  override def nullSafeEval(input: Any): Any =
    BpeCensusDelta.delta(input.asInstanceOf[UTF8String].toString,
      symA, symB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("symA", symA, "java.lang.String")
    val bRef = ctx.addReferenceObj("symB", symB, "java.lang.String")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeCensusDelta.delta($t.toString(), $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCensusDeltaExpr =
    copy(child = newChild)
}

/** The bracket-encoded training stream of a document — lowercase,
  * non-`[a-z0-9]` runs collapsed to one `<|>` boundary, every
  * surviving char wrapped `<c>` — as ONE native pass. Byte-identical
  * to the declarative chain
  * `regexp_replace(regexp_replace(lower(t), '[^a-z0-9]+', '|'), '(.)', '<$1>')`
  * (which the DuckDB oracle and [[TextAnalysis.bpeTrainRecount]]
  * keep, so the delta ≡ recount spec cross-checks this encoding too);
  * the `(.)` wrap is a per-char regex engine invocation over the
  * whole corpus and was the measured floor of the training setup. */
case class BpeBracketizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_bracketize"

  override def nullSafeEval(input: Any): Any =
    BpeCensusDelta.bracketize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeCensusDelta.bracketize($t);")

  override protected def withNewChildInternal(newChild: Expression): BpeBracketizeExpr =
    copy(child = newChild)
}

object BpeCensusDelta {

  /** Static so generated code calls it directly. Matches the regex
    * chain exactly: Spark's `lower` IS `UTF8String.toLowerCase`, and
    * any non-alphabet run (unicode included — the regex replaced
    * those before wrapping ever saw them) collapses to one boundary
    * symbol. */
  def bracketize(text: UTF8String): UTF8String = {
    val lower = text.toLowerCase.toString
    val n = lower.length
    val sb = new java.lang.StringBuilder(n * 3)
    var i = 0
    var prevBoundary = false
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        sb.append('<').append(c).append('>')
        prevBoundary = false
      } else {
        if (!prevBoundary) sb.append("<|>")
        prevBoundary = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  val Shape: ArrayType = ArrayType(StructType(Seq(
    StructField("sym_a", StringType, nullable = false),
    StructField("sym_b", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Static so generated code calls it directly. Documents without an
    * occurrence return a shared empty array (one `indexOf` miss, no
    * allocation). */
  def delta(s: String, a: String, b: String): ArrayData = {
    val pat = "<" + a + "><" + b + ">"
    var idx = s.indexOf(pat)
    if (idx < 0) return Empty
    val ab = a + b
    val out = new java.util.ArrayList[Object]()
    def pair(x: String, y: String, w: Long): Unit =
      if (x != "|" && y != "|") {
        out.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(x), UTF8String.fromString(y), w)))
        ()
      }
    var prevEnd = -1
    while (idx >= 0) {
      val end = idx + pat.length
      pair(a, b, -1L)
      if (idx > 0) {
        if (idx == prevEnd) { // chain: previous occurrence abuts
          pair(b, a, -1L); pair(ab, ab, 1L)
        } else { // symbol ends at idx: s(idx-1) == '>'
          val open = s.lastIndexOf('<', idx - 1)
          val l = s.substring(open + 1, idx - 1)
          pair(l, a, -1L); pair(l, ab, 1L)
        }
      }
      if (end < s.length && !s.startsWith(pat, end)) {
        val close = s.indexOf('>', end)
        val r = s.substring(end + 1, close)
        pair(b, r, -1L); pair(ab, r, 1L)
      }
      prevEnd = end
      idx = s.indexOf(pat, end)
    }
    new GenericArrayData(out.toArray)
  }
}
