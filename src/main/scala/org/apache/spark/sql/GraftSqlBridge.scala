package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made the direct
  * `Column(expr)` constructor internal (`classic.ExpressionUtils` is
  * private[sql]); extension libraries shipping custom codegen'd
  * expressions (graft.functions.VectorExprs) need exactly these two
  * conversions and nothing else, so this is the complete internal surface
  * we touch.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builtin-style function on an existing session (the
    * SparkSessionExtensions path only applies at session construction).
    */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(name, info, builder)
}
