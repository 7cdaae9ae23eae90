package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 removed `Column.expr` from
  * the public API (Column now wraps a ColumnNode); the supported conversion
  * lives in `private[sql]` ExpressionUtils, so this shim sits inside the
  * `org.apache.spark.sql` package hierarchy — the standard pattern for
  * Spark-native extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. [[expression]] wraps the node in
    * a lazy `ColumnNodeExpression` placeholder that only materializes at
    * Dataset boundaries — fine inside DataFrame plans, but a function
    * registry BUILDER must hand the analyzer a real catalyst tree (the
    * placeholder is neither resolvable nor codegen-able inside
    * `spark.sql(...)`). This converts immediately; the resulting tree may
    * contain `UnresolvedFunction`/lambda-variable nodes, which the
    * analyzer's own fixed-point then resolves — exactly what it does for
    * any SQL-authored expression. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a temp SQL function on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` path only applies at session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
