package graft.core

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{BaseLimitExec, CollectLimitExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Executed-plan audits shared by Bench telemetry and PlanSpec asserts.
  *
  * The q_vocab_encode defect class (r4 verdict): a global Sort (usually
  * under a Window with no partition spec) fed by a single-partition
  * shuffle with NO limit bounding the data below — every row of the
  * input lands in ONE task. A single-partition exchange feeding a FINAL
  * aggregation is not flagged (it carries one partial-agg row per map
  * partition — bounded by partition count, not data volume), and neither
  * is a sort above TakeOrderedAndProject/limit (merging <= k rows on one
  * task is the design). */
object PlanAudit {

  private def hasLimitBelow(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => hasLimitBelow(a.executedPlan)
    case q: QueryStageExec => hasLimitBelow(q.plan)
    case _: TakeOrderedAndProjectExec | _: BaseLimitExec | _: CollectLimitExec => true
    case other => other.children.exists(hasLimitBelow)
  }

  /** Does this Sort input chain (through AQE stage wrappers) reach an
    * unbounded single-partition shuffle? */
  private def sortInputUnboundedSingle(c: SparkPlan): Boolean = c match {
    case a: AdaptiveSparkPlanExec => sortInputUnboundedSingle(a.executedPlan)
    case q: QueryStageExec => sortInputUnboundedSingle(q.plan)
    case r: AQEShuffleReadExec => sortInputUnboundedSingle(r.child)
    case e: ShuffleExchangeLike =>
      e.outputPartitioning == SinglePartition && !hasLimitBelow(e.child)
    case _ => false
  }

  /** Count of global sorts running over an UNBOUNDED single partition in
    * the final (post-AQE) plan — 0 for every healthy query. */
  def unboundedSinglePartitionSorts(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => unboundedSinglePartitionSorts(a.executedPlan)
    case q: QueryStageExec => unboundedSinglePartitionSorts(q.plan)
    case s: SortExec =>
      (if (sortInputUnboundedSingle(s.child)) 1 else 0) +
        unboundedSinglePartitionSorts(s.child)
    case other => other.children.map(unboundedSinglePartitionSorts).sum
  }
}
