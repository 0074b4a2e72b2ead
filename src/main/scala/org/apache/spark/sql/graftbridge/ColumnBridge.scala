package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column <-> Expression bridge. Spark 4 made the conversion utilities
  * `private[sql]`; like other Spark extension libraries, we expose the two
  * conversions from inside the sql package tree. Used only to register the
  * graft Column combinators as named SQL functions — the resulting plans
  * are ordinary Catalyst expression trees.
  *
  * Conversion is EAGER (ColumnNodeToExpressionConverter), not the lazy
  * ColumnNodeExpression wrapper — function-registry builders run inside
  * analysis, after the wrapper-conversion rule has already fired, so a
  * lazy wrapper would survive to codegen and fail as Unevaluable.
  */
object ColumnBridge {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
