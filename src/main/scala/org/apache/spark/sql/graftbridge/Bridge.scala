package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4 routes `Column` through ColumnNode and keeps the converters
  * `private[sql]`; libraries that ship native expressions re-export them
  * from inside the sql namespace (the established pattern across the
  * Spark ecosystem). This is the only graft file outside the `graft`
  * package, and it contains no logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
