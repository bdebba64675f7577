package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Thin bridge into `private[sql]` constructors: building a DataFrame
 * from a custom [[LogicalPlan]] (the graft ASOF join node) needs
 * `Dataset.ofRows`, which Spark scopes to its own package. This is the
 * standard extension-library pattern — one file inside the package
 * boundary, everything else outside it.
 */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
