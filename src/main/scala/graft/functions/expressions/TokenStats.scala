package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of character counts over a string array — the mean-word-length
  * numerator of the quality gates, as ONE codegen'd O(n) pass. Replaces
  * the `aggregate(transform(...))` higher-order form, which Catalyst
  * evaluates interpreted per row (a lambda dispatch per token). */
case class TokenCharSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "token_char_sum"

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.charSum(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.charSum($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Highest frequency of any single value in a string array — the
  * mode-count behind the repetition gate, as one codegen'd hash-counting
  * pass. Replaces the `transform(array_distinct(toks), w → size −
  * array_remove)` form, which is interpreted AND O(distinct × tokens)
  * per row — quadratic on long documents. */
case class TokenModeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "token_mode_count"

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.modeCount(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.modeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Java-static shims so generated code has a stable call target. */
object TokenStatsImpl {
  def charSum(arr: ArrayData): Long = {
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) sum += arr.getUTF8String(i).numChars()
      i += 1
    }
    sum
  }

  def modeCount(arr: ArrayData): Long = {
    // UTF8String keys are content-hashed views into the row buffer —
    // valid for the duration of this single-row call
    val m = new java.util.HashMap[UTF8String, Integer]()
    var max = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = m.getOrDefault(s, 0) + 1
        m.put(s, c)
        if (c > max) max = c
      }
      i += 1
    }
    max.toLong
  }
}
