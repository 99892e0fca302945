package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 wraps `Column` around `ColumnNode` instead of `Expression`; the
  * classic converters live in `org.apache.spark.sql.classic.ExpressionUtils`
  * which is `private[sql]`, so third-party native Expressions need this
  * one-hop shim placed inside the `org.apache.spark.sql` package.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
