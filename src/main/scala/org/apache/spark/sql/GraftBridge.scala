package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private Column ⇄ Expression converters so
  * graft's native Catalyst expressions (e.g. SimHash64) can be exposed
  * as `Column`s — the standard pattern for Spark extension libraries. */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a plain catalyst Expression tree (no
    * deferred ColumnNode wrapper) — required when splicing a
    * functions._-built Column into a hand-constructed LogicalPlan
    * (e.g. a table-function Generate), where the analyzer won't
    * resolve the lazy wrapper. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a function builder into an EXISTING session's registry —
    * the post-hoc twin of `SparkSessionExtensions.injectFunction` for
    * sessions built without `spark.sql.extensions`. */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** The exact INVALID_URL error `parse_url` raises in ANSI mode —
    * `QueryExecutionErrors` is private[sql], so native URL kernels
    * reach it through here. */
  def invalidUrlError(url: org.apache.spark.unsafe.types.UTF8String,
      e: java.net.URISyntaxException): Throwable =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .invalidUrlError(url, e)

  /** Table-function twin of [[registerFunction]]. */
  def registerTableFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .registerFunction(name, info, builder)
}
