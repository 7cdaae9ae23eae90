package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Two-level (IMI-style) nearest-centroid assignment: argmin over the
  * COARSE codebook, then argmin over that cell's FINE sub-codebook —
  * composite cell id = coarse·fineStride + fineIdx.
  *
  * Why it exists: SemDeDup-style pair work is Σ|cell|², so LINEAR total
  * pair cost needs constant cell SIZE — a codebook that grows with the
  * corpus (k ∝ N). Flat argmin ([[CentroidArgMin]]) pays k·d multiplies
  * per row, which at k = N/c makes ASSIGNMENT quadratic-ish in N — the
  * next scale killer after round 16's codegen bail. Two levels pay
  * (k₀ + k₁)·d per row for k₀·k₁ effective cells: 256×156 ≈ 40k cells at
  * 412·d instead of 40 000·d — the standard inverted-multi-index trade.
  *
  * Distance and tie rules are [[CentroidArgMin]]'s exactly (score
  * ‖c‖² − 2·⟨v,c⟩ with driver-side left-to-right norm folds, ties to the
  * lower index, NaN orders greatest) at BOTH levels, so an oracle replays
  * the composite assignment as two chained argmin windows. Codebooks ride
  * as reference objects — generated code is constant-size in k₀, k₁, d.
  *
  * NULL input / null element / dimension mismatch → NULL (the
  * [[DotProduct]] totality rule). `fineStride` must be ≥ every
  * sub-codebook's size and is part of the cell-id contract: decode with
  * coarse = cell / fineStride, fine = cell % fineStride.
  */
case class TwoLevelArgMin(child: Expression, coarse: Seq[Seq[Double]],
                          fine: Seq[Seq[Seq[Double]]], fineStride: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(coarse.nonEmpty && coarse.forall(_.length == coarse.head.length),
    "coarse codebook must be non-empty and rectangular")
  require(fine.length == coarse.length,
    s"need one fine sub-codebook per coarse cell (${fine.length} vs ${coarse.length})")
  require(fine.forall(f => f.nonEmpty && f.forall(_.length == coarse.head.length)),
    "every fine sub-codebook must be non-empty with coarse's dimensionality")
  require(fineStride >= fine.map(_.length).max,
    s"fineStride $fineStride < largest sub-codebook ${fine.map(_.length).max}")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "two_level_argmin"

  private val k0: Int = coarse.length
  private val dim: Int = coarse.head.length

  // keep codebooks out of plan strings (see CentroidArgMin.toString)
  override def toString: String =
    s"two_level_argmin($child, k0=$k0, kf<=${fine.map(_.length).max}, d=$dim)"

  @transient private lazy val coarseFlat: Array[Double] =
    coarse.flatten.toArray
  @transient private lazy val coarseNorms: Array[Double] =
    coarse.map(c => c.map(x => x * x).sum).toArray
  // all sub-codebooks concatenated; fineOff(c) = first vector index of
  // cell c's book, fineCnt(c) = its size
  @transient private lazy val fineFlat: Array[Double] =
    fine.flatten.flatten.toArray
  @transient private lazy val fineNorms: Array[Double] =
    fine.flatten.map(c => c.map(x => x * x).sum).toArray
  @transient private lazy val fineOff: Array[Int] =
    fine.map(_.length).scanLeft(0)(_ + _).init.toArray
  @transient private lazy val fineCnt: Array[Int] =
    fine.map(_.length).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    val v = x.toDoubleArray()
    def argmin(flat: Array[Double], norms: Array[Double],
               from: Int, cnt: Int): Int = {
      var best = 0
      var bestD = Double.NaN
      var c = 0
      while (c < cnt) {
        var dot = 0.0
        val off = (from + c) * dim
        var j = 0
        while (j < dim) { dot += v(j) * flat(off + j); j += 1 }
        val dist = norms(from + c) - 2.0 * dot
        if (c == 0 || dist < bestD || (bestD.isNaN && !dist.isNaN)) {
          bestD = dist; best = c
        }
        c += 1
      }
      best
    }
    val bc = argmin(coarseFlat, coarseNorms, 0, k0)
    val bf = argmin(fineFlat, fineNorms, fineOff(bc), fineCnt(bc))
    bc * fineStride + bf
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cF = ctx.addReferenceObj("coarseFlat", coarseFlat, "double[]")
    val cN = ctx.addReferenceObj("coarseNorms", coarseNorms, "double[]")
    val fF = ctx.addReferenceObj("fineFlat", fineFlat, "double[]")
    val fN = ctx.addReferenceObj("fineNorms", fineNorms, "double[]")
    val fO = ctx.addReferenceObj("fineOff", fineOff, "int[]")
    val fC = ctx.addReferenceObj("fineCnt", fineCnt, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val v = ctx.freshName("v")
      val dot = ctx.freshName("dot")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val anyNull = ctx.freshName("anyNull")
      val bc = ctx.freshName("bc")
      val from = ctx.freshName("from")
      val cnt = ctx.freshName("cnt")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $anyNull = true; break; }
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double[] $v = $a.toDoubleArray();
         |    int $best = 0;
         |    double $bestD = Double.NaN;
         |    for (int $c = 0; $c < $k0; $c++) {
         |      double $dot = 0.0;
         |      int $off = $c * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $dot += $v[$j] * $cF[$off + $j];
         |      }
         |      double $dist = $cN[$c] - 2.0 * $dot;
         |      // generated lines must never START with '|' (stripMargin hazard)
         |      if ($c == 0 || $dist < $bestD ||
         |          (Double.isNaN($bestD) && !Double.isNaN($dist))) {
         |        $bestD = $dist; $best = $c;
         |      }
         |    }
         |    int $bc = $best;
         |    int $from = $fO[$bc];
         |    int $cnt = $fC[$bc];
         |    $best = 0;
         |    $bestD = Double.NaN;
         |    for (int $c = 0; $c < $cnt; $c++) {
         |      double $dot = 0.0;
         |      int $off = ($from + $c) * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $dot += $v[$j] * $fF[$off + $j];
         |      }
         |      double $dist = $fN[$from + $c] - 2.0 * $dot;
         |      if ($c == 0 || $dist < $bestD ||
         |          (Double.isNaN($bestD) && !Double.isNaN($dist))) {
         |        $bestD = $dist; $best = $c;
         |      }
         |    }
         |    ${ev.value} = $bc * $fineStride + $best;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
