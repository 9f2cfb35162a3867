package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash of one document straight from its WORD array, in a
  * single in-row pass: per bit j, the majority vote of (md5-hash bit j
  * → +1/−1) across the document's DISTINCT word k-shingles; the
  * signature packs the winning bits.
  *
  * The aggregate form shuffles every feature into 32 conditional sums;
  * this computes the identical votes map-side with zero shuffle — the
  * feature hash is the first 8 md5 hex chars (big-endian unsigned 32 of
  * the first 4 digest bytes), exactly the column form's
  * conv(substring(md5(sh),1,8),16,10), so signatures are bit-identical
  * to the SQL twin. Takes words rather than prebuilt shingle strings
  * for the same reason as [[MinHashSig]]: a Spark-side shingle array is
  * re-split per element wherever the optimizer inlines it (pushed
  * filters, collapsed projections), and in-row shingling never
  * allocates the strings at all.
  */
case class SimHash32(child: Expression, shingleK: Int)
  extends UnaryExpression {

  require(shingleK >= 1, s"shingleK=$shingleK must be >= 1")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash32.compute($a, $shingleK);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** Static so generated code can call it without a reference object.
    * NOTE: votes are over the DISTINCT feature set (the column form
    * aggregates a deduplicated (doc, shingle) frame — a repeated
    * shingle must not vote twice). Distinctness is keyed on the FULL
    * 128-bit md5 digest rather than the shingle string: two distinct
    * shingles dedupe together only on a full md5 collision, which also
    * yields identical per-bit votes (same wh), so the only divergence
    * from string-dedupe is the vote COUNT on a crafted collision — not
    * a case natural text produces. */
  def compute(words: ArrayData, k: Int): Long = {
    val votes = new Array[Int](32)
    val n = words.numElements()
    if (n >= k) {
      val md = MinHashSig.md5() // shared thread-local digest
      val wb = MinHashSig.wordBytes(words)
      val seen = new java.util.HashSet[java.lang.Long]()
      var p = 0
      while (p <= n - k) {
        val digest = MinHashSig.shingleDigest(md, wb, p, k)
        val d0 = MinHashSig.be64(digest, 0)
        val d1 = MinHashSig.be64(digest, 8)
        // 64-bit mix of the full digest as the set key: within-document
        // collision odds are ~|shingles|²/2⁶⁵ — negligible, and in line
        // with the md5-derived keying used across the pipeline
        if (seen.add(d0 * -7046029254386353131L ^ d1)) {
          val wh = d0 >>> 32 // first 8 hex chars
          var j = 0
          while (j < 32) {
            votes(j) += (if (((wh >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
        p += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
