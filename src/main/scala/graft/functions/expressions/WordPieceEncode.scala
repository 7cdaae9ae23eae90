package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy WordPiece encode (longest-prefix-first, `##` continuations,
  * per-word `[UNK]`) as a codegen'd Catalyst expression.
  *
  * Why an expression and not the pure-Column fold
  * ([[graft.text.WordPiece.encodeWordFold]]): higher-order functions
  * (`aggregate`/`transform` lambdas) have no `doGenCode` — they
  * evaluate INTERPRETED per element, and the greedy fold runs
  * O(len·maxPieceLen) interpreted steps per word. At the 1M-doc probe
  * that cost ~95 s for 50M tokens; this expression runs the same scan
  * as one tight JVM loop over a shared hash set, inside the
  * surrounding WholeStageCodegen span (same rationale as
  * [[PorterStem]]). The fold form is kept as a semantics
  * cross-check — `WordPieceSpec` asserts expression == fold ==
  * independent plain-Scala matcher over the whole corpus.
  *
  * The vocabulary rides along as an expression field: `nullSafeEval`
  * and the generated code both call one [[WordPieceMatcher]] instance
  * attached via `ctx.addReferenceObj`, so driver-side state is the
  * vocab itself (driver-tiny by the tokenizer contract) and executors
  * receive it through plan serialization like any literal. */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(vocab.nonEmpty, "WordPiece vocabulary must be non-empty")

  // declared input type so misuse (a non-string column) fails at ANALYSIS
  // with a typed message, not at execution with a ClassCastException in
  // nullSafeEval/codegen (the sweep rule all sibling expressions follow)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val matcher = new WordPieceMatcher(vocab)

  override def nullSafeEval(v: Any): Any =
    matcher.encodeUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matcher", matcher,
      classOf[WordPieceMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The greedy matcher the generated code calls — one hash-set probe per
  * candidate length, longest first; whole-word `[UNK]` on a dead
  * cursor. */
final class WordPieceMatcher(vocab: Seq[String]) extends Serializable {
  private val vset: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  private val maxLen: Int = vocab.iterator
    .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
  private val unk: Array[AnyRef] =
    Array(UTF8String.fromString(graft.text.WordPiece.Unk))

  def encode(word: String): Array[AnyRef] = {
    val n = word.length
    if (n == 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
    var pos = 0
    while (pos < n) {
      val prefix = if (pos == 0) "" else "##"
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = prefix + word.substring(pos, pos + l)
        if (vset.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) return unk
      out += UTF8String.fromString(hit)
      pos += l
    }
    out.toArray
  }

  def encodeUtf8(word: UTF8String): ArrayData =
    new GenericArrayData(encode(word.toString))
}
