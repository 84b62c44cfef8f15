package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column↔Expression converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); third-party native
  * expressions reach them through a shim inside the sql namespace —
  * the same pattern Spark's own connector ecosystem uses.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion of a Column tree to a catalyst Expression.
    * `expression` returns a lazy `ColumnNodeExpression` wrapper that
    * only the DataFrame API's analysis path unwraps — injected into a
    * SQL FunctionRegistry builder it survives to codegen unresolved
    * (Unevaluable). This runs the classic converter up front, yielding
    * a plain (still analyzable) catalyst tree that the SQL analyzer
    * resolves like any parsed expression.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
