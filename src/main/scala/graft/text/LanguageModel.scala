package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language model scoring — the classic
  * perplexity-style quality filter of an LLM data pipeline (score every
  * document under a cheap LM, drop the high-surprisal tail).
  */
object LanguageModel {

  /** Per-document mean token surprisal under an add-one-smoothed unigram
    * model trained on the corpus itself:
    *
    *   surprisal(d) = − Σ_t c_{d,t} · ln((c_t + 1) / (N + V)) / n_d
    *
    * with c_t the corpus count of token t, N total tokens, V vocabulary
    * size, c_{d,t} the in-doc count and n_d the doc length. Low = typical
    * text, high = out-of-distribution (the filterable tail).
    *
    * Scale shape: two grouped aggregates off one explode pass — per-doc
    * token counts (shuffle on (doc, token), map-side combinable) and the
    * corpus model derived FROM those counts (shuffle on token, partials
    * again). The model is a real table (a 100 TB corpus has ~10⁸ distinct
    * tokens), so the score join is a plain equi-join on token — NOT a
    * forced broadcast; only the 1-row (N, V) frame is broadcast. The
    * per-doc sum is exact integer counts through IEEE ln/÷, identical on
    * any engine up to summation order (callers round before comparing).
    */
  def unigramSurprisal(df: DataFrame, idCol: Column, toks: Column): DataFrame = {
    val docCounts = df.select(idCol.as("doc"), explode(toks).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("c"))
    val model = docCounts.groupBy("token").agg(sum(col("c")).as("cc"))
    val totals = model.agg(sum(col("cc")).cast("double").as("N"),
      count(lit(1)).cast("double").as("V"))
    docCounts.join(model, "token")
      .crossJoin(broadcast(totals))
      .groupBy("doc")
      .agg((-sum(col("c") * log((col("cc").cast("double") + lit(1.0)) / (col("N") + col("V"))))
        / sum(col("c"))).as("surprisal"))
  }
}
