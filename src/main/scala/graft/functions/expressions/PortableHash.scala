package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit portable string hash: the first 15 hex digits of md5 as a long —
  * numerically identical to `conv(substring(md5(s),1,15),16,10)` (and to
  * the DuckDB oracle expression), but computed straight from the digest
  * bytes: no hex-string render, no base-16 reparse, no intermediate
  * allocations. This chain sits under every shingle/minhash/fingerprint
  * query, so the constant factor matters at corpus scale. */
case class PortableHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "portable_hash"

  override def nullSafeEval(v: Any): Any =
    HashUtil.md5Prefix60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashUtil.md5Prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashUtil {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** xxhash64 of the string bytes, seed 42 — the same value Spark's
    * built-in `xxhash64()` produces for a string column, so the fast-path
    * generator and the column-level `fastHash` agree. */
  def xx64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, org.apache.spark.sql.types.StringType, 42L)

  /** First 15 hex nibbles of md5 as a long: bytes 0..6 fully, plus the
    * high nibble of byte 7. */
  def md5Prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xffL) >>> 4)
  }
}
