package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** Bridge for plan-introspection tooling (WindowGuardSpec): materialize an
  * arbitrary analyzed `LogicalPlan` subtree back into a `DataFrame` so a
  * guard test can COUNT the exact input of a plan fragment (e.g. the child
  * of a global Window) without relying on per-node SQL metrics, which
  * WindowExec/SortExec do not expose. `Dataset.ofRows` is `private[sql]`
  * in Spark 4, hence this one-liner in the `org.apache.spark.sql`
  * namespace (same pattern as [[ColumnShim]]).
  */
object PlanProbe {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
