package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the engine's custom-plan path needs:
  * wrap a hand-built [[LogicalPlan]] (e.g.
  * [[graft.plans.TopKPerKeyNode]]) back into a public [[DataFrame]].
  * Spark exposes no public constructor for this — every extension
  * library opens the same package-scoped door. Kept to this single
  * file so the engine's use of non-public API is auditable at a
  * glance. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
