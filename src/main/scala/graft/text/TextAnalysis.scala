package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document-level text analysis: language-ID, quality scoring, token
  * stats. All per-row expression pipelines — embarrassingly parallel, no
  * shuffle until the caller aggregates, so they scale linearly with input
  * splits at 100 TB.
  */
object TextAnalysis {

  /** Per-language stopword-hit scores + argmax language guess.
    * Ties resolve in `LangStopwords` declaration order (en first) —
    * mirrored exactly by the oracle's CASE chain. */
  def withLangId(df: DataFrame, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    val scored = LangStopwords.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", lexiconHits(toks, words))
    }
    val langs = LangStopwords.map(_._1)
    val pred = langs.init.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (lang, i)) =>
        val rest = langs.drop(i + 1).map(l => col(s"score_$lang") >= col(s"score_$l"))
        val cond = rest.reduce(_ && _)
        Some(acc.fold(when(cond, lang))(_.when(cond, lang)))
    }.get.otherwise(langs.last)
    scored.withColumn("pred_lang", pred)
  }

  /** Quality score in [0,1]: 0.4·stopword-ratio + 0.6·min(n_tokens/50, 1).
    * Both terms are exact IEEE double ops from integer inputs, so the
    * score (and its decile bucket) is bit-identical across engines. */
  def withQuality(df: DataFrame, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    val nTok = size(toks).cast("double")
    val stopRatio = lexiconHits(toks, LangStopwords.head._2).cast("double") / nTok
    val lenTerm = least(nTok / 50.0, lit(1.0))
    df.withColumn("quality", lit(0.4) * stopRatio + lit(0.6) * lenTerm)
      .withColumn("quality_bucket", floor(col("quality") * 10).cast("long"))
  }

  /** CCNet-style line-level boilerplate removal: drop every line whose
    * document frequency exceeds `maxDocFrac` of the corpus (navigation
    * bars, cookie banners, "subscribe" footers — the lines that repeat
    * across a crawl), and reassemble each document from its surviving
    * lines in original order. Documents whose every line is boilerplate
    * drop out entirely (nothing left to keep).
    *
    * Scale shape: one posexplode on the line separator (map-side), one
    * distinct (line, doc) + grouped count for the line DF table — the
    * line table is the shuffle, keyed on the line text itself; hot
    * boilerplate lines are exactly the rows the count is FOR, and they
    * collapse to one row per line via map-side partials before the
    * exchange. The 1-row corpus total broadcasts; reassembly is one
    * grouped sort_array over (pos, line) structs per doc. */
  def stripBoilerplateLines(df: DataFrame, idCol: Column, textCol: Column,
                            maxDocFrac: Double): DataFrame = {
    val lines = df.select(idCol.as("doc"),
      posexplode(split(textCol, "\n")).as(Seq("pos", "line")))
    val lineDf = lines.select(col("line"), col("doc")).distinct()
      .groupBy("line").agg(count(lit(1)).as("line_df"))
    val total = df.agg(count(lit(1)).cast("double").as("n_docs"))
    lines.join(lineDf, "line")
      .crossJoin(broadcast(total))
      .withColumn("_keep", col("line_df").cast("double") / col("n_docs") <= maxDocFrac)
      .groupBy("doc")
      .agg(
        array_join(transform(
          sort_array(collect_list(when(col("_keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("clean_text"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_dropped"))
      .filter(col("n_kept") > 0)
  }

  /** Corpus-wide boilerplate n-gram MINER: the top-`topK` token
    * n-grams by DOCUMENT frequency — the builder of the blocklist the
    * substring/safety gates consume (cookie banners, nav bars, license
    * footers: the phrases that appear in thousands of documents are
    * boilerplate by definition; nothing else in the engine MINES them).
    *
    * Scale shape — strings never shuffle: pass 1 explodes per-doc
    * DISTINCT arithmetic shingle HASHES (8-byte longs; doc frequency =
    * a map-side-combinable count because of the per-doc distinct),
    * takes the global top-k as TakeOrderedAndProject; pass 2 re-scans
    * the corpus for (hash, n-gram string) pairs but keeps only rows
    * surviving a BROADCAST semi-join against the k winning hashes —
    * so n-gram STRINGS materialize only for the k candidates, and the
    * exchange they enter is k-sized. Two corpus scans beat one scan
    * that ships every shingle string through the count shuffle. Hash
    * collisions (different strings, one hash bucket) resolve to the
    * MIN string, replayed identically by the oracle. Ordering ties
    * break on the hash. Returns (ngram, h, df, rk). */
  def boilerplateNgrams(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 3, topK: Int = 20): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(topK >= 1 && topK <= 10000,
      s"topK must be in [1, 10000] (it broadcasts), got $topK")
    // _tk as its own projection column: the q110 lesson — an inline
    // tokens() inside the shingle lambdas re-splits per element
    def base = df.select(idCol.as("doc"),
      tokens(canonicalize(textCol)).as("_tk"))
    val dfreq = base
      .select(explode(array_distinct(shingleHashArray(col("_tk"), n))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    val top = dfreq.orderBy(col("df").desc, col("h")).limit(topK)
    val strings = base
      .select(explode(arrays_zip(
        shingleHashArray(col("_tk"), n).as("h"),
        shingles(col("_tk"), n).as("s"))).as("z"))
      .select(col("z.h").as("h"), col("z.s").as("ngram"))
      .join(broadcast(top.select("h")), Seq("h"), "left_semi")
      .groupBy("h").agg(min("ngram").as("ngram"))
    top.join(strings, "h")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("h"))).cast("long"))
      .select("ngram", "h", "df", "rk")
  }

  /** Repetition ratio in [0,1]: distinct tokens / total tokens — the
    * boilerplate/spam signal (low ratio = heavy repetition) a quality
    * filter combines with [[withQuality]]. Exact integer inputs to one
    * IEEE division, so bit-identical across engines. */
  def withRepetition(df: DataFrame, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    // try_divide mirrors the oracle's nullif-guard: a zero-token doc (not
    // producible by the current tokenizer, which never returns an empty
    // array, but reachable if it ever drops empty tokens) yields NULL on
    // both engines instead of an ANSI DIVIDE_BY_ZERO on the Spark side.
    df.withColumn("distinct_ratio",
        try_divide(size(array_distinct(toks)).cast("double"),
          size(toks).cast("double")))
      .withColumn("repetition_bucket",
        floor(col("distinct_ratio") * 10).cast("long"))
  }

  /** C4/Gopher-style boolean quality gates, one flag column per rule —
    * the rule-based companion to [[withQuality]]'s scalar score (real
    * pipelines ship both: rules gate, the score ranks). All four rules
    * are exact-integer-derived IEEE comparisons, so pass/fail is
    * bit-identical across engines:
    *  - `fail_min_tokens`  — under 25 tokens (fragment);
    *  - `fail_word_len`    — mean word length outside [3, 10]
    *    (gibberish / symbol soup on either end);
    *  - `fail_repetition`  — most frequent token above 20% of the doc
    *    (boilerplate);
    *  - `fail_stopwords`   — stopword ratio under 2% (non-prose).
    * The rule set is ENGLISH-ONLY by design, like C4's — the stopword
    * gate uses the English lexicon for every document, so non-English
    * prose trips `fail_stopwords` (run it after a language filter, treat
    * the flag as "non-English-prose", or use [[withRuleFlagsByLang]] on
    * multilingual corpora). Zero-token documents fail
    * `word_len`/`stopwords` and pass `repetition`: every flag is a
    * real boolean, never a null tri-state. The mean-length and
    * mode-frequency stats are codegen'd single-pass expressions
    * ([[graft.functions.expressions.TokenCharSum]] /
    * [[graft.functions.expressions.TokenModeCount]]) — the interpreted
    * higher-order forms they replace cost O(distinct×tokens) per row.
    * Pure per-row projection, no shuffle until the caller aggregates. */
  def withRuleFlags(df: DataFrame, textCol: Column): DataFrame =
    ruleFlags(df, textCol, toks => lexiconHits(toks, LangStopwords.head._2))

  /** [[withRuleFlags]] with a LANGUAGE-AWARE stopword gate: the lexicon
    * follows `langCol` (declaration-order chain over `LangStopwords`;
    * languages without a lexicon fall back to English, i.e. they still
    * gate as "non-English-prose" — the honest behavior when no lexicon
    * exists). The other three gates are language-neutral. Use this on
    * multilingual corpora where English-only [[withRuleFlags]] would
    * reject normal es/de/fr prose as non-prose. */
  def withRuleFlagsByLang(df: DataFrame, textCol: Column, langCol: Column): DataFrame =
    ruleFlags(df, textCol, toks =>
      LangStopwords.tail.foldRight(lexiconHits(toks, LangStopwords.head._2)) {
        case ((lang, words), acc) =>
          when(langCol === lang, lexiconHits(toks, words)).otherwise(acc)
      })

  private def ruleFlags(df: DataFrame, textCol: Column,
                        stopHitsFor: Column => Column): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.expressions.{TokenCharSum, TokenModeCount}
    // NULL text coalesces to "" so every flag is a real boolean — a null
    // would flow through size() as null and make when(flag, …) silently
    // count the row as passing. tokens() never yields an EMPTY array
    // (split of a trimmed empty string is [""], one zero-length token),
    // so n ≥ 1 always: the divisions below cannot hit 0, and ""/null
    // text deterministically fails every gate (meanLen 0, maxFreq 1,
    // stopRatio 0) — the right verdict for a contentless document.
    val toks = tokens(coalesce(textCol, lit("")))
    val n = size(toks).cast("double")
    val meanLen = Bridge.column(TokenCharSum(Bridge.expression(toks))).cast("double") / n
    val maxFreq = Bridge.column(TokenModeCount(Bridge.expression(toks))).cast("double") / n
    val stopRatio = stopHitsFor(toks).cast("double") / n
    df.withColumn("fail_min_tokens", size(toks) < 25)
      .withColumn("fail_word_len", !(meanLen >= 3.0 && meanLen <= 10.0))
      .withColumn("fail_repetition", maxFreq > 0.2)
      .withColumn("fail_stopwords", stopRatio < 0.02)
  }

  /** Gopher-style repetition signals, one row per document:
    *  - `dup_line_frac` — fraction of lines that repeat an earlier line
    *    of the same doc (1 − distinct/total over the newline split);
    *  - `top2gram_frac` / `top3gram_frac` — fraction of the doc's tokens
    *    covered by its single most frequent 2-/3-gram (mode count × n
    *    over n_tokens);
    *  - `rep_fail` — the composite gate at the published Gopher-ish
    *    thresholds (dup lines > 30%, top 2-gram > 20%, top 3-gram
    *    > 18%). NOTE: a doc under ~17 tokens trips the n-gram
    *    thresholds arithmetically (one occurrence of any 2-gram is
    *    already 2/n > 0.2 for n < 10) — Gopher's rules presuppose the
    *    min-length gate; run this alongside [[withRuleFlags]]'
    *    `fail_min_tokens` (25) the way the paper composes them, and
    *    read `rep_fail` only on docs that pass it.
    * All per-row: the n-gram mode counts reuse the codegen'd
    * [[graft.functions.expressions.TokenModeCount]] over the existing
    * shingle generator, so the scan shape is identical to the other
    * quality gates — no shuffle until the caller aggregates. Docs
    * shorter than n tokens have no n-gram (fraction 0, can't fail). */
  def withRepetitionSignals(df: DataFrame, textCol: Column): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.expressions.TokenModeCount
    // MATERIALIZE the token array as its own projection column before
    // shingling: shingles()'s lambda indexes the token array per
    // element, and with an inline tokens() expression Catalyst would
    // re-run the regex split on every access (O(n²) tokenization per
    // doc — visible in the q110 plan as split() nested inside every
    // lambda). CollapseProject keeps a multiply-referenced non-cheap
    // alias as a separate projection, so the split runs once per row.
    // the shingle list is empty exactly when the doc has < n tokens —
    // guarding on the token count avoids building the shingle array a
    // second time just to size() it
    def topNGramFrac(n: Int): Column = {
      val sh = shingles(col("_rs_toks"), n)
      when(size(col("_rs_toks")) < n, lit(0.0)).otherwise(
        Bridge.column(TokenModeCount(Bridge.expression(sh))).cast("double") * n /
          size(col("_rs_toks")).cast("double"))
    }
    df.withColumn("_rs_toks", tokens(coalesce(textCol, lit(""))))
      .withColumn("_rs_lines", split(coalesce(textCol, lit("")), "\n"))
      .withColumn("dup_line_frac",
        lit(1.0) - size(array_distinct(col("_rs_lines"))).cast("double") /
          size(col("_rs_lines")).cast("double"))
      .withColumn("top2gram_frac", topNGramFrac(2))
      .withColumn("top3gram_frac", topNGramFrac(3))
      .withColumn("rep_fail",
        col("dup_line_frac") > 0.3 || col("top2gram_frac") > 0.2 ||
          col("top3gram_frac") > 0.18)
      .drop("_rs_toks", "_rs_lines")
  }

  /** Within-document paragraph/line dedup: keep each distinct line's
    * FIRST occurrence, preserve original order, reassemble — the
    * in-doc companion of [[stripBoilerplateLines]] (which needs corpus
    * statistics; this needs none). Spark's `array_distinct` is
    * first-occurrence order-preserving, so the whole operator is one
    * per-row projection: no explode, no shuffle, nothing leaves the
    * row. Returns (doc, clean_text, n_kept, n_dropped). */
  def dedupParagraphs(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val lines = split(coalesce(textCol, lit("")), "\n")
    val kept = array_distinct(lines)
    df.select(idCol.as("doc"),
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast("long").as("n_kept"),
      (size(lines) - size(kept)).cast("long").as("n_dropped"))
  }

  /** Sentiment via the [[SentimentScorer]] seam. The default
    * [[LexiconSentiment]] is the q44 oracle semantics (lexicon counts,
    * integer-compared label); pass [[WeightedSentiment]] for a
    * model-backed logistic scorer — same output columns either way. */
  def withSentiment(df: DataFrame, textCol: Column,
                    scorer: SentimentScorer = LexiconSentiment): DataFrame =
    scorer.score(df, textCol)

  /** Safety/toxicity blocklist gate — the rule-based content gate a
    * curation pipeline runs next to the C4/Gopher quality gates
    * ([[withRuleFlags]]): a HARD lexicon (ANY hit blocks — the
    * "never train on this" tier) and a SOFT lexicon with an integer
    * per-mille token-ratio threshold, so scattered incidental mentions
    * pass while a document saturated with blocked vocabulary does not
    * (the standard blocklist-gate shape — e.g. C4's "bad words" filter
    * — with the ratio form that avoids its known over-blocking of
    * incidental mentions). Tokens are canonicalized (ASCII case-fold +
    * whitespace collapse) before probing so casing cannot dodge the
    * gate. Each probe is ONE codegen'd [[graft.functions.expressions
    * .LexiconHitCount]] pass; the verdict is pure integer arithmetic
    * (`hits·1000 > permille·n_tok`) — per-row, no shuffle,
    * DuckDB-replayable. Adds `n_tok`, `n_hard`, `n_soft`, and
    * `safety` ∈ {'blocked_hard','blocked_ratio','pass'}. */
  def withSafetyGate(df: DataFrame, textCol: Column,
                     hardWords: Seq[String], softWords: Seq[String],
                     softPermille: Long = 50L): DataFrame = {
    require(softPermille >= 0, s"softPermille must be >= 0, got $softPermille")
    val toks = tokens(canonicalize(textCol))
    df.withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_hard", lexiconHits(toks, hardWords))
      .withColumn("n_soft", lexiconHits(toks, softWords))
      .withColumn("safety",
        when(col("n_hard") > 0, lit("blocked_hard"))
          .when(col("n_soft") * 1000L > lit(softPermille) * col("n_tok"),
            lit("blocked_ratio"))
          .otherwise(lit("pass")))
  }
}
