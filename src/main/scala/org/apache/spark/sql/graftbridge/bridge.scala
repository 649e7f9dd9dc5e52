package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ↔ Expression bridge. Spark 4 made these converters
  * private[sql]; extension libraries conventionally expose them from a
  * file compiled into the org.apache.spark.sql package tree (the same
  * approach Sedona / spark-excel use). Only graft's own native
  * expressions go through here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** the EAGER converted tree (ExpressionUtils.expression returns a
    * lazy ColumnNodeExpression wrapper whose children aren't walkable
    * until analysis) — for structural matching of a Column's algebra */
  def expressionTree(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}

/** LogicalPlan → DataFrame (Dataset.ofRows went private[sql] too) —
  * the acceleration rule re-wraps the plan it was handed so the
  * routing machinery can analyze/execute it as an ordinary frame. */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
    : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
