package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of character counts over a string array — the mean-word-length
  * numerator of the quality gates, as ONE codegen'd O(n) pass. Replaces
  * the `aggregate(transform(...))` higher-order form, which Catalyst
  * evaluates interpreted per row (a lambda dispatch per token). */
case class TokenCharSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "token_char_sum"

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.charSum(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.charSum($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Highest frequency of any single value in a string array — the
  * mode-count behind the repetition gate, as one codegen'd hash-counting
  * pass. Replaces the `transform(array_distinct(toks), w → size −
  * array_remove)` form, which is interpreted AND O(distinct × tokens)
  * per row — quadratic on long documents. */
case class TokenModeCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "token_mode_count"

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.modeCount(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.modeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of array elements that belong to a fixed lexicon — the
  * stopword-ratio numerator of the quality gates, the language-ID
  * scores, and the sentiment/classifier hit counts, as ONE codegen'd
  * O(n) set-probe pass. Replaces the `Σ_w (size − size(array_remove))`
  * composition, which allocates a fresh array AND walks the tokens once
  * PER LEXICON WORD (k walks + k allocations per row — the dominant
  * per-row cost of the gate path at 1M docs). Semantics are identical:
  * exact string equality, null elements never match, null array → null. */
case class LexiconHitCount(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "lexicon_hit_count"

  @transient private lazy val lexicon: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.lexiconHits(v.asInstanceOf[ArrayData], lexicon)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexicon", lexicon, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.lexiconHits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bag-of-words linear model in ONE pass:
  * `bias + Σ_i weights(i) · count(words(i) in toks)`, with the summation
  * performed in WEIGHT order — bit-identical IEEE doubles to the
  * `foldLeft` of per-word count columns it replaces (counts are exact
  * integers; only the final weighted sum touches floats), so the
  * generated DuckDB oracle SQL needs no change. The per-word-column
  * form walks the token array once PER WEIGHT and inlines one literal
  * term per word into the expression tree — O(k·n) per row and a
  * codegen method-size blowup at realistic fastText vocabularies
  * (10k–100k words); this expression is O(n + k) with the vocabulary
  * held in a reference object, so model size never touches the plan. */
case class LexiconWeightedSum(child: Expression, words: Seq[String],
                              weights: Seq[Double], bias: Double)
    extends UnaryExpression with ExpectsInputTypes {
  require(words.size == weights.size, "one weight per word")
  require(words.distinct.size == words.size,
    "duplicate vocabulary entry — the fold form would double-count it; " +
      "merge the weights instead")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "lexicon_weighted_sum"

  /** Word → index of its FIRST occurrence in `words`; a duplicated word
    * counts into the first slot, matching the fold form where later
    * duplicate terms would each re-count the same token (callers pass
    * distinct vocabularies; the q-fixture specs pin this). */
  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    words.zipWithIndex.foreach { case (w, i) =>
      m.putIfAbsent(UTF8String.fromString(w), i)
    }
    m
  }
  @transient private lazy val wts: Array[Double] = weights.toArray

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.weightedSum(v.asInstanceOf[ArrayData], index, wts, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("lexiconIndex", index, "java.util.HashMap")
    val wRef = ctx.addReferenceObj("lexiconWeights", wts, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.weightedSum($c, $idxRef, $wRef, ${bias}D)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling fingerprint over token hashes in ONE codegen'd
  * pass: fold `(acc·31 + hash(t) mod tokenMod) mod mod` in array order.
  * Replaces the `aggregate(transform(...))` form, whose lambda HOFs
  * always evaluate interpreted (a dispatch per token) — the last
  * interpreted HOF in a per-row path. `portable = true` hashes via the
  * md5-prefix family (oracle-replayable, the q34 path); `false` via
  * xxhash64+pmod (the fast path). Null tokens are skipped (split-based
  * token arrays never contain them); a null array yields null, matching
  * the HOF form. Mods are parameters so the SQL twin's constants
  * (`TextFunctions.FpTokenMod/FpMod`) stay single-sourced. */
case class RollingFingerprint(child: Expression, portable: Boolean,
                              tokenMod: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(v: Any): Any =
    TokenStatsImpl.rollingFingerprint(
      v.asInstanceOf[ArrayData], portable, tokenMod, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStatsImpl.rollingFingerprint(" +
        s"$c, $portable, ${tokenMod}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Java-static shims so generated code has a stable call target. */
object TokenStatsImpl {
  def charSum(arr: ArrayData): Long = {
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) sum += arr.getUTF8String(i).numChars()
      i += 1
    }
    sum
  }

  def rollingFingerprint(arr: ArrayData, portable: Boolean,
                         tokenMod: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h =
          if (portable) HashUtil.md5Prefix60(s) % tokenMod // 60-bit, non-negative
          else { // pmod: xxhash64 can be negative
            val v = HashUtil.xx64(s) % tokenMod
            if (v < 0) v + tokenMod else v
          }
        acc = (acc * 31L + h) % mod
      }
      i += 1
    }
    acc
  }

  def weightedSum(arr: ArrayData, index: java.util.HashMap[UTF8String, Integer],
                  weights: Array[Double], bias: Double): Double = {
    val counts = new Array[Long](weights.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val idx = index.get(arr.getUTF8String(i))
        if (idx != null) counts(idx.intValue()) += 1L
      }
      i += 1
    }
    // weight-order summation: bit-identical to the foldLeft column form
    var z = bias
    var j = 0
    while (j < weights.length) {
      z += weights(j) * counts(j)
      j += 1
    }
    z
  }

  def lexiconHits(arr: ArrayData, lexicon: java.util.HashSet[UTF8String]): Long = {
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && lexicon.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def modeCount(arr: ArrayData): Long = {
    // UTF8String keys are content-hashed views into the row buffer —
    // valid for the duration of this single-row call
    val m = new java.util.HashMap[UTF8String, Integer]()
    var max = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = m.getOrDefault(s, 0) + 1
        m.put(s, c)
        if (c > max) max = c
      }
      i += 1
    }
    max.toLong
  }
}
