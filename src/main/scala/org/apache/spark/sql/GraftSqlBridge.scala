package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: build a DataFrame from a raw LogicalPlan.
  * This is the standard extension-library shim (Spark keeps
  * `Dataset.ofRows` package-private); it is the only thing this file does,
  * and the only file outside the `graft` package.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
