package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` Dataset construction — the
  * standard pattern Spark extension libraries use to rebuild a
  * DataFrame after a logical-plan rewrite (here: stripping
  * row-preserving repartitions before a sizing count; see
  * graft.profile.Profiler.cheapCount).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
