package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for every left row, the latest right row with
  * right.ts ≤ left.ts in the same key group, appended as
  * (asof_ts, asof_value) — nulls when nothing precedes.
  *
  * This is the whole-operator rung of the custom-operator ladder
  * (SURVEY §7.3): Spark has no as-of join; [[graft.operators.AsOfJoin]]
  * COMPOSES one from union + window (one shuffle of both sides), and
  * this node + [[AsOfJoinStrategy]] + [[BroadcastAsOfJoinExec]] plan
  * the dimension-sized-right-side case with ZERO shuffle instead.
  *
  * The node is constructed already-resolved (attributes come from the
  * analyzed child plans — see `AsOfJoin.broadcastAsOf`); `asofTs` /
  * `asofValue` are fresh attributes this node produces.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValue: Attribute,
    asofTs: AttributeReference,
    asofValue: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofTs :+ asofValue

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(asofTs, asofValue))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}
