package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** The sentiment seam. The reference scores sentiment with a pretrained
  * downloaded model (`Sentiment_Analysis.py:44-58` loads a HuggingFace
  * pipeline); this engine is zero-egress, so SURVEY §7 sanctions a
  * deterministic substitution — but the SEAM is the contract: every
  * scorer appends the same four columns
  * `(n_pos, n_neg, sentiment ∈ {positive,negative,neutral}, polarity)`
  * so call sites ([[TextAnalysis.withSentiment]], the Reddit
  * ten-questions pipeline, q44) swap scorers without changing shape.
  * Implementations must be pure per-row column pipelines — no shuffle,
  * no UDFs — so scoring stays embarrassingly parallel at 100 TB.
  */
trait SentimentScorer {
  /** Append `n_pos, n_neg, sentiment, polarity` derived from `textCol`. */
  def score(df: DataFrame, textCol: Column): DataFrame
}

/** Default scorer: positive/negative lexicon hit counts, 3-way label by
  * INTEGER comparison (no float threshold, so labels can't drift across
  * engines), polarity = (n_pos − n_neg) / n_tokens. This is the q44
  * oracle semantics. */
object LexiconSentiment extends SentimentScorer {
  def score(df: DataFrame, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    df.withColumn("n_pos", lexiconHits(toks, PosWords))
      .withColumn("n_neg", lexiconHits(toks, NegWords))
      .withColumn("sentiment",
        when(col("n_pos") > col("n_neg"), "positive")
          .when(col("n_pos") < col("n_neg"), "negative")
          .otherwise("neutral"))
      .withColumn("polarity",
        (col("n_pos") - col("n_neg")).cast("double") / size(toks).cast("double"))
  }
}

/** Model-backed scorer: a logistic model over token counts with weights
  * loaded from a file — the shape a real trained sentiment head has
  * (bag-of-words logistic regression), proving the seam swaps beyond
  * the lexicon default. The log-odds are
  * `z = bias + Σ_w weight(w) · count(w in tokens)`, evaluated as one
  * codegen'd expression tree (a fixed fold over the vocabulary in file
  * order — deterministic IEEE summation, no map lookup HOF in the hot
  * path); `polarity = 2·σ(z) − 1 ∈ (−1, 1)` and the label is the sign
  * of z (σ(z) vs ½ — exact, no epsilon). `n_pos`/`n_neg` count hits in
  * the positive-/negative-weight vocabulary so the seam's count columns
  * stay meaningful.
  *
  * The weights file is a model ARTIFACT (tiny by contract, like the IVF
  * codebook): one `token<TAB>weight` per line, optional `__bias__`
  * row, read once on the driver and inlined into the plan as literals
  * — nothing joins, nothing broadcasts, scoring is per-row. */
final case class WeightedSentiment(weights: Seq[(String, Double)], bias: Double)
    extends SentimentScorer {
  require(weights.nonEmpty, "a weighted scorer needs at least one token weight")

  def score(df: DataFrame, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    // z in ONE codegen'd token walk (LexiconWeightedSum), summed in
    // weight order — bit-identical to the per-word foldLeft it replaces
    // (and to the generated oracle SQL), but O(n + k) per row, so a
    // realistic fastText-sized vocabulary neither re-walks the tokens
    // per word nor inlines k literal terms into the plan
    val z = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.expressions.LexiconWeightedSum(
        org.apache.spark.sql.graft.Bridge.expression(toks),
        weights.map(_._1), weights.map(_._2), bias))
    val posVocab = weights.collect { case (w, wt) if wt > 0 => w }
    val negVocab = weights.collect { case (w, wt) if wt < 0 => w }
    df.withColumn("n_pos", lexiconHits(toks, posVocab))
      .withColumn("n_neg", lexiconHits(toks, negVocab))
      .withColumn("_z", z)
      .withColumn("sentiment",
        when(col("_z") > 0d, "positive")
          .when(col("_z") < 0d, "negative")
          .otherwise("neutral"))
      .withColumn("polarity", lit(2d) / (lit(1d) + exp(-col("_z"))) - lit(1d))
      .drop("_z")
  }
}

object WeightedSentiment {
  /** DuckDB twin of [[WeightedSentiment.score]]'s log-odds: the SAME
    * weights seq folded in the SAME order over per-token counts of the
    * token-list expression `tkE`. Oracle SQL must be generated from
    * this (not hand-written) so bit-exact z parity holds by
    * construction — both engines then sum identical doubles
    * left-to-right. */
  def zSql(weights: Seq[(String, Double)], bias: Double, tkE: String): String =
    weights.foldLeft(s"CAST($bias AS DOUBLE)") { case (acc, (w, wt)) =>
      s"$acc + CAST($wt AS DOUBLE) * len(list_filter($tkE, t -> t = '$w'))"
    }

  /** Load a `token<TAB>weight` file (driver-side, model-artifact-sized);
    * a `__bias__` row sets the intercept, blank lines and `#` comments
    * skip. Fails loudly on malformed rows — a silently half-loaded
    * model is worse than no model. */
  def load(path: String): WeightedSentiment = {
    import scala.jdk.CollectionConverters._
    val rows = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .asScala.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        l.split('\t') match {
          case Array(tok, wt) => tok -> wt.toDouble
          case _ => throw new IllegalArgumentException(
            s"malformed weights row (want token<TAB>weight): '$l'")
        }
      }.toSeq
    val (biasRows, tokenRows) = rows.partition(_._1 == "__bias__")
    WeightedSentiment(tokenRows, biasRows.lastOption.map(_._2).getOrElse(0d))
  }
}
