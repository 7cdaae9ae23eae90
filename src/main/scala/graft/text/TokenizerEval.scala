package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling.microRatioSql

/** Tokenizer EVALUATION — the card a multilingual pipeline reads before
  * committing to a vocabulary: per language, FERTILITY (tokens per
  * whitespace word — the multilingual-NLP term of art; a tokenizer
  * trained on English text fragments other scripts into many short
  * pieces, inflating sequence length and training cost for those
  * languages) and COMPRESSION (characters per token). A fertility of
  * 2–3× for one language against another is exactly the imbalance
  * temperature-sampled vocab training (q134's α-rebalance) exists to
  * fix; this card is how that defect is SEEN.
  *
  * Extension tier (`/root/reference` has no tokenizer-evaluation
  * surface; its NLP pipeline tokenizes one language and never audits
  * the tokenizer itself).
  */
object TokenizerEval {

  /** Per-language fertility/compression card over ANY tokenizer: the
    * caller supplies per-document word, token, and char counts (so the
    * same card serves the regex pre-tokenizer — oracle-replayable,
    * q222 — and the learned byte-BPE, whose merge table no oracle can
    * replay; the spec instantiates both). Ratios are exact staged
    * integer micro-ratios ([[graft.operators.Sampling.microRatioSql]] —
    * no float division crosses an engine boundary). One map-side-
    * combinable aggregation; output is |languages| rows.
    *
    * Output: (lang, n_docs, sum_words, sum_tokens, sum_chars,
    * fertility_micro = 10⁶·tokens/words, chars_per_token_micro =
    * 10⁶·chars/tokens); degenerate denominators (an empty language
    * partition's 0 words or 0 tokens) release NULL rather than a fake
    * ratio. */
  def fertilityCard(df: DataFrame, langCol: Column, wordsCol: Column,
                    tokensCol: Column, charsCol: Column): DataFrame =
    df.select(langCol.as("lang"), wordsCol.cast("long").as("_w"),
        tokensCol.cast("long").as("_t"), charsCol.cast("long").as("_c"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("_w").as("sum_words"),
        sum("_t").as("sum_tokens"),
        sum("_c").as("sum_chars"))
      .withColumn("fertility_micro",
        when(col("sum_words") > 0L,
          expr(microRatioSql("sum_tokens", "sum_words", "div"))))
      .withColumn("chars_per_token_micro",
        when(col("sum_tokens") > 0L,
          expr(microRatioSql("sum_chars", "sum_tokens", "div"))))
}
