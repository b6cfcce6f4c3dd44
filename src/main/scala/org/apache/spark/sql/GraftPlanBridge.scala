package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library-side bridge to `Dataset.ofRows` (which is `private[sql]`):
  * the standard mechanism a Spark-extension library uses to wrap a
  * custom LogicalPlan (here graft.plans.AsofMergeJoin) back into a
  * public DataFrame. Contains no logic — one delegation call. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
