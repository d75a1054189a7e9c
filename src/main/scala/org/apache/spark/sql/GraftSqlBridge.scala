package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge: Column ⇄ Catalyst Expression conversion for
  * graft's custom expressions. Spark 4 made `ExpressionUtils` and the
  * `Column(node)` constructor `private[sql]`, so third-party Catalyst
  * expressions need one forwarding object inside the package. No Spark
  * internals are modified — this only re-exports two conversions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion: expands the column node into
    * a plain catalyst tree (function names become catalyst
    * `UnresolvedFunction`s the analyzer resolves normally). The lazy
    * [[expression]] wrapper is fine inside Dataset operations, but a
    * tree returned from a `SparkSessionExtensions.injectFunction`
    * builder must be analyzer-visible — the lazy wrapper reaches
    * codegen unresolved there. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
