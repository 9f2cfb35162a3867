package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash of one document's feature (shingle) array in a single
  * in-row pass: per bit j, the majority vote of (md5-hash bit j → +1/−1)
  * across features; the signature packs the winning bits.
  *
  * The aggregate form shuffles every feature into 32 conditional sums;
  * this computes the identical votes map-side with zero shuffle — the
  * feature hash is the first 8 md5 hex chars (big-endian unsigned 32 of
  * the first 4 digest bytes), exactly the column form's
  * conv(substring(md5(sh),1,8),16,10), so signatures are bit-identical
  * to the SQL twin. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash32.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** Static so generated code can call it without a reference object.
    * NOTE: votes must be over the DISTINCT feature set (the column form
    * aggregates a deduplicated (doc, shingle) frame — a repeated
    * shingle must not vote twice). */
  def compute(shingles: ArrayData): Long = {
    val md = MinHashSig.md5() // shared thread-local digest
    // dedupe on the shingle STRING, like the column form's distinct
    // (keying on the 32-bit hash would merge colliding shingles that
    // the column form counts as two votes)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (seen.add(s.toString)) {
        val digest = md.digest(s.getBytes)
        var wh = 0L
        var b = 0
        while (b < 4) { wh = (wh << 8) | (digest(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 32) {
          votes(j) += (if (((wh >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
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
