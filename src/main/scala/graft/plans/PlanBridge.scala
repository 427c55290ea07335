/* Lives in the org.apache.spark.sql namespace solely to reach the
 * `private[sql]` Dataset.ofRows constructor — the supported way to wrap a
 * custom LogicalPlan (graft.plans.AsofJoin) in a user-facing DataFrame.
 * No Spark internals are modified; this is a visibility bridge only. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
