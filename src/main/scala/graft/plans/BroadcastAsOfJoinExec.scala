package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join for a dimension-sized right side: collect the
  * right child, group per key into ts-sorted arrays, broadcast, and
  * binary-search per left row — the BroadcastHashJoin shape with a
  * "latest ≤ ts" probe instead of equality.
  *
  * Scale contract (the reason this operator exists): the PROBE side —
  * the 100 TB fact stream — is never shuffled, never sorted, and its
  * partitioning is preserved; the composed union+window as-of
  * ([[graft.operators.AsOfJoin.asOf]]) shuffles and sorts both sides.
  * The build side must fit in memory like any broadcast build
  * (dimension snapshots: prices, configs, slowly-changing attributes).
  *
  * Build-side determinism: rows with a null key or null ts are dropped
  * (they can never be "the latest at-or-before"); callers make
  * (key, ts) unique — [[graft.operators.AsOfJoin.broadcastAsOf]]
  * pre-aggregates max(value) per (key, ts) — so equal-ts ties cannot
  * make the probe nondeterministic. Probe rows with a null key or ts
  * get null results (SQL join semantics: null matches nothing).
  *
  * Timestamps are BIGINT (epoch micros — the suite-wide convention);
  * requiring a concrete primitive keeps the binary search allocation-
  * free. Not codegen'd: the operator body is a broadcast lookup, and
  * its inputs/outputs stay UnsafeRow, so the codegen boundary costs one
  * row copy per side — noise next to the avoided shuffle.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightValue: Expression,
    asofTs: Attribute,
    asofValue: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofTs :+ asofValue

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(asofTs, asofValue))

  /** Probe-side distribution flows through untouched — the planner must
    * not insert an exchange below this operator. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val rVal = BindReferences.bindReference(rightValue, right.output)

    // build: key -> (ts ascending, values aligned). executeCollect
    // returns copied rows, so held UTF8String/array values stay valid.
    val index: Map[Any, (Array[Long], Array[Any])] = right.executeCollect()
      .iterator
      .flatMap { row =>
        val k = rKey.eval(row)
        val t = rTs.eval(row)
        if (k == null || t == null) None
        else Some((k, t.asInstanceOf[Long], rVal.eval(row)))
      }
      .toSeq
      .groupBy(_._1)
      .map { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        k -> (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      }

    val leftRdd = left.execute()
    val bc = leftRdd.sparkContext.broadcast(index)
    val lKeyGen = leftKey
    val lTsGen = leftTs
    val leftOutput = left.output
    val outAttrs = output

    leftRdd.mapPartitions { iter =>
      val idx = bc.value
      val lKey = BindReferences.bindReference(lKeyGen, leftOutput)
      val lTs = BindReferences.bindReference(lTsGen, leftOutput)
      val extra = new GenericInternalRow(2)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.map { row =>
        extra.update(0, null)
        extra.update(1, null)
        val k = lKey.eval(row)
        val t = lTs.eval(row)
        if (k != null && t != null) {
          idx.get(k).foreach { case (tsArr, valArr) =>
            // greatest index with tsArr(i) <= t
            var lo = 0
            var hi = tsArr.length - 1
            var res = -1
            val target = t.asInstanceOf[Long]
            while (lo <= hi) {
              val m = (lo + hi) >>> 1
              if (tsArr(m) <= target) { res = m; lo = m + 1 }
              else hi = m - 1
            }
            if (res >= 0) {
              extra.update(0, tsArr(res))
              extra.update(1, valArr(res))
            }
          }
        }
        proj(joined(row, extra))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
