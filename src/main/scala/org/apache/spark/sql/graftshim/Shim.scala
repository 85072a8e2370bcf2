package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge for the graft engine's custom
  * expressions. Lives under org.apache.spark.sql so the `private[sql]`
  * classic converters are visible — the conventional shim pattern for
  * Spark extension libraries (no Spark internals are modified). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
