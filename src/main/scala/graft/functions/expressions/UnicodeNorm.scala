package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a Catalyst expression — Spark ships no
  * normalizer builtin, and a multilingual dedup pipeline that skips it
  * sees `é` (U+00E9) and `e`+U+0301 as different documents. Composes
  * canonical-equivalent sequences per UAX #15, which both the JDK
  * (`java.text.Normalizer`) and DuckDB (`nfc_normalize`, utf8proc)
  * implement identically — so the oracle replays it exactly. Same
  * codegen shape as [[PorterStem]]: a static shim call inside the
  * surrounding WholeStageCodegen span, no UDF boundary. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeNorm.nfc(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.expressions.UnicodeNorm.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent stripping (NFD-decompose, drop combining marks, NFC-recompose
  * the remainder): `café` → `cafe`, `ñ` → `n`, while characters with no
  * canonical decomposition (`ø`, CJK) pass through untouched — matching
  * DuckDB's `strip_accents` (utf8proc) so the search-key / dedup-key
  * pipelines stay oracle-replayable. */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "strip_accents"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeNorm.stripAccents(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.expressions.UnicodeNorm.stripAccents($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Java-static shims so generated code has stable call targets. The
  * fast-path guards (`Normalizer.isNormalized`, pure-ASCII scan) skip
  * allocation entirely for the overwhelmingly common already-normalized
  * row — normalization cost is paid only where a combining sequence
  * actually occurs. */
object UnicodeNorm {
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  def stripAccents(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val c = d.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }
}
