package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-pattern SUBSTRING counter (Aho–Corasick DFA over
  * UTF-8 bytes) — the substring tier of the blocklist gates: the
  * token-level [[LexiconHitCount]] only sees whitespace-delimited
  * words, while real blocklists must also hit embedded matches
  * (`"badword"` inside `"xbadwordx"`). A per-pattern
  * `length − length(replace(...))` composition walks the text once PER
  * PATTERN (the exact k-walk tax [[LexiconHitCount]] removed for
  * tokens); this expression makes ONE transition per input byte with
  * the whole pattern set compiled into a dense byte-DFA held in a
  * reference object — O(n + Σ|p|·256 build) — so blocklist size never
  * touches the plan or the per-row cost.
  *
  * Counting semantics (the oracle contract): every pattern counts its
  * occurrences independently; occurrences of DIFFERENT patterns may
  * overlap. Each pattern is required to be BORDER-FREE (no proper
  * prefix equal to a suffix), which makes self-overlap impossible — so
  * the DFA's count-all-matches total is exactly the per-pattern
  * non-overlapping `replace`-count that DuckDB replays
  * ([[graft.functions.TextFunctions.substringHitsSql]]). Real blocklist
  * terms are border-free in practice; a bordered pattern fails loudly
  * at construction instead of silently diverging from the oracle.
  *
  * Byte-level matching is exact for character-level semantics: UTF-8 is
  * self-synchronizing, so a valid pattern encoding only ever matches at
  * codepoint boundaries. Null input → null, like every UnaryExpression.
  */
case class SubstringHitCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty, "substring_hit_count needs at least one pattern")
  require(patterns.distinct.size == patterns.size,
    "duplicate blocklist pattern — it would double-count; deduplicate")
  patterns.foreach { p =>
    require(p.nonEmpty, "empty pattern matches everywhere — remove it")
    val b = p.getBytes("UTF-8")
    val bordered = (1 until b.length).exists(k =>
      java.util.Arrays.equals(b, 0, k, b, b.length - k, b.length))
    require(!bordered,
      s"pattern '$p' has a border (a proper prefix equal to a suffix): " +
        "self-overlapping patterns make the one-pass count diverge from " +
        "the non-overlapping replace-count oracle semantics")
  }

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "substring_hit_count"

  @transient private lazy val dfa =
    new AhoCorasickCounter(patterns.map(_.getBytes("UTF-8")))

  override def nullSafeEval(v: Any): Any =
    dfa.countAll(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dfa", dfa,
      "graft.functions.expressions.AhoCorasickCounter")
    defineCodeGen(ctx, ev, c => s"$ref.countAll($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dense-byte-alphabet Aho–Corasick automaton with match counts folded
  * through suffix links at build time: matching is `state =
  * dfa[state][byte]; total += cnt[state]` — two array reads per input
  * byte, no per-row allocation. Memory is |trie nodes|·256 ints —
  * blocklist-sized by construction (nodes ≤ Σ pattern bytes + 1). */
final class AhoCorasickCounter(patterns: Seq[Array[Byte]]) extends Serializable {

  private val (goto_, cnt) = {
    val maxNodes = patterns.map(_.length).sum + 1
    val g = Array.fill(maxNodes, 256)(-1)
    val ends = new Array[Int](maxNodes)
    var nNodes = 1
    patterns.foreach { p =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xff
        if (g(s)(c) == -1) { g(s)(c) = nNodes; nNodes += 1 }
        s = g(s)(c)
        i += 1
      }
      ends(s) += 1
    }
    // BFS fail links, folding counts and converting goto to a total DFA
    val fail = new Array[Int](nNodes)
    val counts = new Array[Long](nNodes)
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val s = g(0)(c)
      if (s == -1) g(0)(c) = 0
      else { fail(s) = 0; queue.add(s) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      counts(s) = ends(s).toLong + counts(fail(s))
      var ch = 0
      while (ch < 256) {
        val t = g(s)(ch)
        if (t == -1) g(s)(ch) = g(fail(s))(ch)
        else { fail(t) = g(fail(s))(ch); queue.add(t) }
        ch += 1
      }
    }
    (g, counts)
  }

  def countAll(s: UTF8String): Long = {
    val n = s.numBytes()
    var st = 0
    var total = 0L
    var i = 0
    while (i < n) {
      st = goto_(st)(s.getByte(i) & 0xff)
      total += cnt(st)
      i += 1
    }
    total
  }
}
