package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal private[sql] bridge: build a DataFrame from a LogicalPlan.
  *
  * Spark exposes plan→DataFrame construction only to its own packages
  * (`classic.Dataset.ofRows` is private[sql]); custom whole-operator
  * nodes (graft.plans.TopKPerKeyNode) need it to offer a DataFrame API
  * entry that works on sessions built without GraftExtensions. This is
  * the standard extension-library shim — one line, no behavior.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
