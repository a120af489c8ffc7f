/*
 * Bridge into Spark's private[sql] Column <-> Expression converters.
 * Spark 4 split Column off to sql-api (backed by ColumnNode); custom
 * Catalyst expressions still need the classic converters, which are
 * private[sql] — so this one file lives inside the org.apache.spark.sql
 * namespace (the standard pattern for Spark extension libraries).
 * Nothing else in graft reaches into Spark internals.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

package object graftbridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom-expression SQL function on a LIVE session (the
    * post-construction twin of `SparkSessionExtensions.injectFunction`;
    * the function registry is `private[sql]`, hence bridged here).
    */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
