package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine similarity over two `array<double>` columns in ONE
  * array traversal.
  *
  * The composed form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` walks
  * each array three times (three [[DotProduct]] loops) and re-reads the
  * array headers per loop; for the all-pairs / batch-kNN hot paths that
  * is 3× the memory traffic of one fused loop accumulating all three
  * sums. Bit-compatibility with the composed form (and with the DuckDB
  * oracle's three `list_reduce` folds) is preserved because each of the
  * three sums is still its own strict left-to-right accumulation and the
  * final combine uses the identical expression tree
  * `s_ab / (sqrt(s_aa) * sqrt(s_bb))` — IEEE doubles make no distinction
  * between interleaved and sequential accumulation of INDEPENDENT sums.
  *
  * Null semantics match the composed form: null input or dimension
  * mismatch → NULL. A zero vector yields NaN (0/0), same as the composed
  * form — callers filter or guard as they already did.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      // null element poisons to NULL — the composed HOF form's totality
      // (same rule as DotProduct; real inputs are null-free, the probe
      // is a bit test)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      sab += xi * yi
      saa += xi * xi
      sbb += yi * yi
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0;
         |  double $saa = 0.0;
         |  double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $sab += $xi * $yi;
         |    $saa += $xi * $xi;
         |    $sbb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sab / (Math.sqrt($saa) * Math.sqrt($sbb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
