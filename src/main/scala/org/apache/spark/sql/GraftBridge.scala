package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessors for `Dataset.ofRows` and Column→Expression
  * conversion (both private[sql] in Spark 4) so graft's custom logical
  * operators can be built from public `Column`s and wrapped back into a
  * DataFrame — the two package-private doors a whole-operator extension
  * needs.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
