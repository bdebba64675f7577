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

  /** Column ⇄ Catalyst expression, for expressions that carry
    * non-literal construction-time state (the IVF router model) and so
    * can't go through the SQL function registry. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
