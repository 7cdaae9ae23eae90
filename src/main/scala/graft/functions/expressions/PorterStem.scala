package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemmer as a Catalyst expression. Generated code calls the
  * static [[graft.text.Porter.stem]] directly, so the stemming stage stays
  * inside the surrounding WholeStageCodegen span instead of forcing a
  * UDF boundary (deserialize → Scala closure → reserialize per row). */
case class PorterStem(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "porter_stem"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Porter2.stem(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.expressions.Porter2.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Java-static shim so generated code has a stable call target. */
object Porter2 {
  def stem(s: String): String = graft.text.Porter.stem(s)
}
