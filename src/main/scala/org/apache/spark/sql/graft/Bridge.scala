package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the graft extension library.
  *
  * Spark 4 moved Column construction behind the private[sql]
  * ExpressionUtils (columnNodeSupport.scala); third-party expression
  * libraries conventionally reach it from a package under
  * org.apache.spark.sql. This is the only file that does so. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a hand-built LogicalPlan (Dataset.ofRows moved into
    * the private[sql] classic module in Spark 4) — the construction
    * surface for custom logical operators like graft.plans.AsOfJoinPlan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
