package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the blessed
  * converter lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]`. This bridge re-exports the two conversions our custom
  * Catalyst expressions need — the standard extension-point shim for
  * libraries shipping native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → catalyst Expression conversion. `expression` wraps the
    * column node lazily (fine inside Dataset API paths, where the analyzer
    * unwraps it), but an expression returned from a FunctionRegistry
    * builder is spliced straight into the analyzed tree — a lazy wrapper
    * there survives to codegen as Unevaluable. This converts the whole
    * node tree to plain catalyst (UnresolvedFunction etc., which the
    * analyzer then resolves normally). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a function builder on an EXISTING session's registry — the
    * per-session twin of `SparkSessionExtensions.injectFunction` (which
    * only applies at session build time). `sessionState` is private[sql],
    * hence this lives in the bridge. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
