package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * Catalyst higher-order function, which is evaluated interpreted (HOFs sit
  * outside whole-stage codegen) and allocates an intermediate array per
  * row. For all-pairs similarity that cost multiplies by |pairs|: the
  * sf0.1 near-dup scan spent ~49s in the interpreted fold. This expression
  * generates a primitive loop inside the WholeStageCodegen stage instead —
  * no allocation, no virtual calls.
  *
  * Summation is a strict left-to-right fold, same order as the
  * interpreted form and the DuckDB oracle's `list_reduce`, so results are
  * bit-identical to both.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  // Inputs are guaranteed array<double> by the Native wrapper's cast.
  override def dataType: DataType = DoubleType

  // NULL for null inputs, mismatched dimensions, AND any null ELEMENT —
  // exactly the aggregate(zip_with(a,b,_*_)) semantics on the full
  // domain: a null element's product poisons the interpreted fold to
  // NULL, so the native form must poison too. That totality is what
  // makes [[graft.plans.HofDotProductToNative]] a sound rewrite for
  // parquet-sourced arrays (element-nullable schemas by default); the
  // per-element isNullAt is a bit probe, noise next to the multiply.
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Dimension mismatch → NULL, matching aggregate(zip_with(a,b,_*_)):
    // zip_with null-pads the short side and the null poisons the sum.
    // Truncating would return a plausible-looking number instead.
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
