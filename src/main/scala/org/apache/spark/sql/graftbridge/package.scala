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
}
