package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of one document's shingle array in a single
  * in-row pass: out[i] = min over shingles of (kh1 + i·kh2) mod 2⁶⁰,
  * with kh1/kh2 the two 60-bit halves of md5(shingle) — the
  * Kirsch-Mitzenmacher family the column form uses.
  *
  * Why an expression: the column form explodes every (doc, shingle)
  * pair and SHUFFLES the full shingle stream into a groupBy-min. This
  * computes signatures map-side with ZERO shuffle, which lets the
  * propose/verify composition build exploded shingles only for the
  * CANDIDATE subset — at corpus scale the difference between shuffling
  * every shingle and shuffling the few that LSH proposed.
  *
  * Bit-exactness with the column form (and the DuckDB oracles):
  * md5 over the UTF-8 bytes; "first 15 hex chars as a number" is the
  * big-endian unsigned 64-bit of the first 8 bytes shifted right one
  * nibble; integer min is order-free.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 7,
    s"numHashes=$numHashes outside the overflow-safe KM range 1..7")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // one static call per row; md5 dominates, the call is noise —
      // and the expression stays inside whole-stage codegen
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val Mod = 1152921504606846976L // 2^60

  // one digest per executor thread — getInstance per row is a registry
  // lookup + allocation on the hot path
  private val digestTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private[functions] def md5(): java.security.MessageDigest = {
    val md = digestTL.get()
    md.reset()
    md
  }

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Static so generated code can call it without a reference object. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val md = md5()
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val digest = md.digest(shingles.getUTF8String(i).getBytes)
      val kh1 = be64(digest, 0) >>> 4 // first 15 hex chars
      val kh2 = be64(digest, 8) >>> 4 // hex chars 17..31
      var h = 0
      while (h < numHashes) {
        val v = (kh1 + h * kh2) % Mod
        if (v < out(h)) out(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
