package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[AsOfJoinNode]] as [[BroadcastAsOfJoinExec]]. Injected via
  * `GraftExtensions` (spark.sql.extensions) or at runtime through
  * `spark.experimental.extraStrategies` (the live-session path
  * [[graft.operators.AsOfJoin.broadcastAsOf]] uses — getOrCreate
  * ignores builder extensions on a running JVM). Matches nothing else,
  * so installing it session-wide is a no-op for every other query.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      BroadcastAsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.rightValue,
        n.asofTs, n.asofValue) :: Nil
    case _ => Nil
  }
}
