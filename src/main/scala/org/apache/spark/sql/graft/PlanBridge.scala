package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Dev-probe bridge: `Dataset.ofRows` is `private[sql]`, but the
  * SortProbe example needs to re-plan a registered query with its
  * top-level Sort stripped to measure the sort's true cost (sampling
  * re-execution included). Probe-only — engine code never builds
  * frames from raw plans.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
