package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge this library needs: materialize a
  * DataFrame from a custom logical plan (`Dataset.ofRows` — the same hook
  * every Spark-native extension library uses to surface custom
  * `LogicalPlan` nodes through the public Column API). Kept to a single
  * function in a single file so the internal surface area is auditable. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
