package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * libraries adding native Catalyst expressions re-export it from a
  * `org.apache.spark.sql` subpackage — the established pattern for
  * Spark-native extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
