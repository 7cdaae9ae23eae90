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

  /** Register a temp SQL function on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` path only applies at session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
