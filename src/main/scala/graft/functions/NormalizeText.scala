package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for crawl cleanup, in one in-row pass:
  * strip the invisible-junk characters a crawler drags in (C0/C1
  * controls except \t \n \r, DEL, zero-widths U+200B..U+200D, BOM
  * U+FEFF), then compose to NFC so visually-identical strings ("é" vs
  * "e"+combining acute) get ONE byte form. Without this, exact dedup
  * (md5 of the text) treats mojibake twins as distinct documents and a
  * zero-width-space variant of a paragraph defeats the paragraph
  * ledger — normalization is the step that makes fingerprints mean
  * "same text".
  *
  * Native codegen'd expression, not a UDF: it runs inside whole-stage
  * codegen like the rest of the fingerprint chain (house pattern of
  * [[SimHash32]]/[[MinHashSig]]). The oracle twin is DuckDB's
  * `nfc_normalize(regexp_replace(text, <class>, '', 'g'))`, and BOTH
  * regex classes are generated from the same [[NormalizeText.Stripped]]
  * code-point ranges ([[NormalizeText.StripRe]] for the Java engine,
  * [[NormalizeText.oracleSql]] for RE2) so the two sides cannot drift.
  *
  * Strip-then-compose order matters and is mirrored on both sides: NFC
  * never PRODUCES a control or zero-width character, but a zero-width
  * BETWEEN a base and its combining mark blocks composition — stripping
  * first lets the pair compose, which is the behavior a dedup pipeline
  * wants.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeText.compute($s);")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}

object NormalizeText {

  /** The strip set as inclusive code-point ranges — the ONE source both
    * regex dialects are generated from: C0 controls minus \t\n\r, DEL,
    * C1 controls (U+0080-U+009F — crawl mojibake, never content),
    * zero-widths U+200B-U+200D, BOM U+FEFF. */
  val Stripped: Seq[(Int, Int)] = Seq(
    (0x00, 0x08), (0x0B, 0x0C), (0x0E, 0x1F), (0x7F, 0x7F),
    (0x80, 0x9F), (0x200B, 0x200D), (0xFEFF, 0xFEFF))

  private def hexEsc(cp: Int): String = f"\\x{$cp%04X}"

  /** Java-dialect character class over [[Stripped]]. `\x{...}` escapes
    * only — no pasted glyphs (an invisible literal next to a `-` would
    * silently become a range endpoint no reviewer can see). */
  val StripRe: String = Stripped
    .map { case (a, b) => if (a == b) hexEsc(a) else hexEsc(a) + "-" + hexEsc(b) }
    .mkString("[", "", "]")

  private val StripPattern = java.util.regex.Pattern.compile(StripRe)

  /** Static so generated code calls it without a reference object.
    * Fast path: a pure-ASCII string with nothing to strip is already
    * NFC — return the input UNCHANGED (no String materialization, no
    * Normalizer call), which is the overwhelming case in a real corpus;
    * the per-row cost there is one byte scan. */
  def compute(input: UTF8String): UTF8String = {
    val n = input.numBytes()
    var i = 0
    var asciiClean = true
    while (asciiClean && i < n) {
      val b = input.getByte(i) & 0xFF
      // bytes >= 0x80 start/continue multi-byte chars -> slow path;
      // ASCII members of the strip class -> slow path
      if (b >= 0x80 || b < 0x09 || b == 0x0B || b == 0x0C ||
        (b >= 0x0E && b <= 0x1F) || b == 0x7F) asciiClean = false
      i += 1
    }
    if (asciiClean) return input
    val stripped = StripPattern.matcher(input.toString).replaceAll("")
    val composed = java.text.Normalizer.normalize(
      stripped, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(composed)
  }

  /** Oracle twin of [[compute]] for a DuckDB column reference —
    * RE2 reads the same `\x{...}` class form, so the identical
    * generated class text is embedded verbatim. */
  def oracleSql(colRef: String): String =
    s"nfc_normalize(regexp_replace($colRef, '$StripRe', '', 'g'))"
}
