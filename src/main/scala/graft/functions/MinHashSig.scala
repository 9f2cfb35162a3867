package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of one document straight from its WORD array, in a
  * single in-row pass: out[i] = min over word k-shingles of
  * (kh1 + i·kh2) mod 2⁶⁰, with kh1/kh2 the two 60-bit halves of
  * md5(shingle) — the Kirsch-Mitzenmacher family the column form uses.
  *
  * Why an expression: the column form explodes every (doc, shingle)
  * pair and SHUFFLES the full shingle stream into a groupBy-min. This
  * computes signatures map-side with ZERO shuffle, which lets the
  * propose/verify composition build exploded shingles only for the
  * CANDIDATE subset — at corpus scale the difference between shuffling
  * every shingle and shuffling the few that LSH proposed.
  *
  * Why it takes WORDS, not prebuilt shingle strings: a Spark-side
  * `transform(sequence(...), i -> concat_ws(...))` shingle array is a
  * CollapseProject/filter-pushdown landmine — any consumer that gets the
  * expression inlined (a pushed filter, a collapsed projection) re-splits
  * the document once per shingle position (measured 20× on this
  * pipeline: 10 s → 0.5 s at sf0.1). Shingling in-row also never
  * allocates a shingle string: the digest is fed word bytes + a space
  * separator incrementally, so md5(bytes) is identical to
  * md5(concat_ws(" ", words[p..p+k-1])) byte-for-byte — bit-exact with
  * the column form and the DuckDB oracles ("first 15 hex chars as a
  * number" = big-endian unsigned 64 of the first 8 bytes >>> 4).
  *
  * Documents with fewer than k words yield an all-MaxValue signature;
  * callers filter them out (`size(words) >= k`), matching the column
  * form, which drops them.
  */
case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int)
  extends UnaryExpression {

  require(shingleK >= 1, s"shingleK=$shingleK must be >= 1")
  require(numHashes >= 1 && numHashes <= 7,
    s"numHashes=$numHashes outside the overflow-safe KM range 1..7")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // one static call per row; md5 dominates, the call is noise —
      // and the expression stays inside whole-stage codegen
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $shingleK, $numHashes);")

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

  private[functions] def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Each word's UTF-8 bytes, fetched ONCE per row — every word feeds up
    * to k shingle digests, and UTF8String.getBytes copies. */
  private[functions] def wordBytes(words: ArrayData): Array[Array[Byte]] = {
    val n = words.numElements()
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { wb(i) = words.getUTF8String(i).getBytes; i += 1 }
    wb
  }

  /** md5 of the shingle words[p..p+k-1] joined by a single space, fed
    * incrementally — byte-identical to digesting the concatenated
    * string, with no string ever built. */
  private[functions] def shingleDigest(md: java.security.MessageDigest,
      wb: Array[Array[Byte]], p: Int, k: Int): Array[Byte] = {
    md.reset()
    var j = 0
    while (j < k) {
      if (j > 0) md.update(' '.toByte)
      md.update(wb(p + j))
      j += 1
    }
    md.digest()
  }

  /** Static so generated code can call it without a reference object. */
  def compute(words: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = words.numElements()
    if (n >= k) {
      val md = md5()
      val wb = wordBytes(words)
      var p = 0
      while (p <= n - k) {
        val digest = shingleDigest(md, wb, p, k)
        val kh1 = be64(digest, 0) >>> 4 // first 15 hex chars
        val kh2 = be64(digest, 8) >>> 4 // hex chars 17..31
        var h = 0
        while (h < numHashes) {
          val v = (kh1 + h * kh2) % Mod
          if (v < out(h)) out(h) = v
          h += 1
        }
        p += 1
      }
    }
    new GenericArrayData(out)
  }
}
