package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `Column` carry a `ColumnNode`
  * instead of a catalyst `Expression`; the conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * Extension libraries that define custom expressions access it through a
  * shim placed under the `org.apache.spark.sql` package — the same pattern
  * used by public Spark extension projects. No Spark internals are modified.
  */
object Bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
