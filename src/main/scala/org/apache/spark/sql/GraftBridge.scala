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
}
