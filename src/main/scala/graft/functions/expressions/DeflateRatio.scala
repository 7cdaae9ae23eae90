package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `floor(10^6 · deflate(text).length
  * / text.byteLength)` — the entropy proxy curation pipelines use to
  * flag templated/repetitive text that token-level repetition stats
  * miss (a page of near-identical boilerplate sentences deflates to a
  * tiny fraction; organic prose sits much higher). Micro-int output so
  * downstream thresholds are exact integer comparisons like every
  * other gate.
  *
  * Determinism contract: `java.util.zip.Deflater` at a FIXED level with
  * default strategy emits no timestamps/headers (raw deflate stream), so
  * the signal is stable across runs and partitionings ON A GIVEN JVM.
  * It is NOT pure Java — Deflater delegates to the JVM's bundled native
  * zlib, and a heterogeneous cluster mixing JDK builds (or zlib-ng-backed
  * runtimes) can emit different compressed lengths for the same input at
  * the same level. Deploy on homogeneous executor images (the standard
  * cluster posture) or treat thresholds on this signal as fuzzy.
  * Spec-tier (DuckDB has no deflate — there is no SQL twin by design;
  * the spec pins monotonicity and same-JVM determinism instead).
  *
  * Per-row cost is the deflate itself; the `Deflater` instance is
  * thread-local and RESET per row, never reallocated — allocation-free
  * steady state on the hot path. Null input → null; empty input → null
  * (a 0-byte doc has no ratio).
  */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(v: Any): Any =
    DeflateRatioImpl.ratioMicro(v.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = "graft.functions.expressions.DeflateRatioImpl"
    val r = ctx.freshName("deflateRatio")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long $r = $impl.ratioMicroRaw($c, $level);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatioImpl {
  private val deflaters = new ThreadLocal[java.util.zip.Deflater]() {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(1, true) // level reset per call below
  }
  private val buf = new ThreadLocal[Array[Byte]]() {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** Micro ratio, or -1 for "null" (empty input) — the codegen-friendly
    * primitive form. */
  def ratioMicroRaw(s: UTF8String, level: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length == 0) return -1L
    val d = deflaters.get()
    // setLevel takes effect only at the NEXT reset() (Deflater javadoc)
    d.setLevel(level)
    d.reset()
    d.setInput(bytes)
    d.finish()
    var compressed = 0L
    val b = buf.get()
    while (!d.finished()) compressed += d.deflate(b)
    math.floorDiv(1000000L * compressed, bytes.length.toLong)
  }

  /** Boxed form for interpreted eval (null on empty). */
  def ratioMicro(s: UTF8String, level: Int): Any = {
    val r = ratioMicroRaw(s, level)
    if (r < 0) null else java.lang.Long.valueOf(r)
  }
}
