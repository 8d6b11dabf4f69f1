package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge for the engine's
  * SparkSessionExtensions function builders.
  *
  * Spark 4 moved `Column` to a ColumnNode representation and scoped the
  * direct converters (`classic.ExpressionUtils`, the `Column` companion)
  * `private[sql]`, so extension libraries that lift Column-combinator
  * kernels into FunctionRegistry builders need this one-hop shim living
  * in an `org.apache.spark.sql` subpackage — the same access pattern
  * Spark's own connectors use. No behavior: two delegating calls.
  */
object ColumnBridge {
  /** EAGER conversion via the active session's node converter —
    * `ExpressionUtils.expression` alone wraps the tree in a lazy
    * `ColumnNodeExpression`, which is Unevaluable and only unwrapped on
    * classic Dataset paths, not inside FunctionRegistry builders (the
    * analyzer would hit "Cannot generate code for expression").
    * Builders run during analysis, so an active session always exists.
    */
  def toExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ClassicConversions
      .castToImpl(SparkSession.active).expression(c)

  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
