package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * wrapping a custom LogicalPlan back into a DataFrame. Lives inside
  * the `org.apache.spark.sql` package tree because `Dataset.ofRows` is
  * `private[sql]` — the standard pattern for out-of-tree plan nodes
  * (same access scope any Spark extension module compiles against).
  * Nothing else in this repo reaches into Spark internals.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
