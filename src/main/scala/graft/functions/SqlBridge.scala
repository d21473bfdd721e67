// Lives in org.apache.spark.sql so graft code can lift its own Catalyst
// expressions into Columns: Spark 4 moved Column to a ColumnNode facade
// and gated the Expression<->Column conversions behind private[sql]
// (classic.ExpressionUtils). This is the one sanctioned-shape crossing
// point; everything graft-specific stays under the graft package.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
