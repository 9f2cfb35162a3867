package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All sign-hash LSH buckets of one embedding in a single codegen'd
  * pass: out[t] = Σ_j (1<<j)·[Σ_d coef(t,j,d)·⌊x_d·10⁶⌋ ≥ 0].
  *
  * The composable form (posexplode 64 dims → broadcast-join the plane
  * frame → two hash aggregations) materializes n·dims·L·b intermediate
  * rows and TWO shuffles before the first bucket exists — at sf0.1
  * that is 10M rows for 5,000 vectors, and at corpus scale it dominates
  * the embedding family. This expression needs zero shuffles: the plane
  * coefficients ride along as a codegen reference object and every
  * bucket is computed in-row, so bucket generation becomes a pure
  * map-side projection.
  *
  * Bit-exactness: identical integer arithmetic to the join form —
  * quantization is `(long) floor(x·10⁶)`, products stay < 2⁵³, and
  * integer addition is order-free — so the DuckDB bucket-CTE oracles
  * are unchanged.
  */
case class LshProject(child: Expression, coefs: Seq[Long], numTables: Int,
    planesPerTable: Int, dims: Int) extends UnaryExpression {

  require(coefs.length == numTables * planesPerTable * dims,
    s"need ${numTables * planesPerTable * dims} coefficients, got ${coefs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_project"

  @transient private lazy val coefArr: Array[Long] = coefs.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(dims, x.numElements())
    val xq = new Array[Long](n)
    var d = 0
    while (d < n) {
      xq(d) = math.floor(x.getDouble(d) * 1000000.0).toLong
      d += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < planesPerTable) {
        val base = (t * planesPerTable + j) * dims
        var s = 0L
        var i = 0
        while (i < n) {
          s += coefArr(base + i) * xq(i)
          i += 1
        }
        if (s >= 0L) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("lshCoefs", coefArr, "long[]")
      val n = ctx.freshName("lpN")
      val xq = ctx.freshName("lpXq")
      val out = ctx.freshName("lpOut")
      val t = ctx.freshName("lpT")
      val j = ctx.freshName("lpJ")
      val i = ctx.freshName("lpI")
      val s = ctx.freshName("lpS")
      val base = ctx.freshName("lpBase")
      val bucket = ctx.freshName("lpBucket")
      s"""
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |long[] $xq = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $xq[$i] = (long) java.lang.Math.floor($a.getDouble($i) * 1000000.0);
         |}
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $planesPerTable; $j++) {
         |    int $base = ($t * $planesPerTable + $j) * $dims;
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $cRef[$base + $i] * $xq[$i];
         |    }
         |    if ($s >= 0L) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshProject =
    copy(child = newChild)
}
