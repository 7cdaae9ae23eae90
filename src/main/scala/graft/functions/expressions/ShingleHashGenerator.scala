package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** Generator emitting one combined k-gram shingle hash per token window —
  * the custom-operator path (SURVEY preference (b/c)) for the dedup
  * pipelines' hottest stage.
  *
  * The composable formulation (posexplode → per-token hash → window
  * `lead` ×(k-1) → fold) needs an Exchange + Sort per evaluation just to
  * see adjacent tokens; this generator sees the whole token array in one
  * row, so shingling becomes a pure map-side Generate with zero shuffles.
  * Values are identical: per-token `md5Prefix60 % M`, then the
  * `acc*8191 + h (mod M)` fold — the same constants the DuckDB oracle
  * uses ([[TextFunctions.shingleHashesSql]]).
  *
  * CodegenFallback is fine here: generators run one eval per input ROW
  * (not per output element), and the surrounding Generate node still
  * pipelines into the parent codegen stage.
  */
case class ShingleHashGenerator(child: Expression, k: Int,
                                portable: Boolean = true)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  private val M = TextFunctions.ShingleM

  override def elementSchema: StructType =
    StructType(Seq(StructField("sh", LongType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < k) return Iterator.empty
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      // portable = md5-prefix (oracle-replayable); fast = xxhash64, the
      // 100 TB path (one mix per token, no digest allocation).
      hs(i) =
        if (portable) HashUtil.md5Prefix60(arr.getUTF8String(i)) % M
        else (HashUtil.xx64(arr.getUTF8String(i)) & Long.MaxValue) % M
      i += 1
    }
    (0 to n - k).iterator.map { j =>
      var acc = hs(j)
      var l = 1
      while (l < k) { acc = (acc * 8191 + hs(j + l)) % M; l += 1 }
      InternalRow(acc)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
