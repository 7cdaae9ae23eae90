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

  /** Per-document mean bigram surprisal under a Jelinek–Mercer-interpolated
    * bigram model trained on the corpus itself:
    *
    *   p(w₂|w₁) = λ · c(w₁w₂)/c(w₁·) + (1−λ) · (c(w₂)+1)/(N+V)
    *   surprisal(d) = − Σ_{bigrams} c_{d,b} · ln p(b) / Σ c_{d,b}
    *
    * with c(w₁w₂) the corpus bigram count, c(w₁·) the count of w₁ as a
    * bigram CONTEXT (first position), and the unigram backoff add-one-
    * smoothed over all corpus tokens — so unseen-in-context bigrams still
    * score. A sharper OOD detector than [[unigramSurprisal]]: scrambled
    * or templated text keeps its unigram profile but loses its bigram
    * transitions. Documents with < 2 tokens have no bigrams and drop out.
    *
    * Scale shape: ONE corpus scan. A single guarded per-row generator
    * emits the unigram stream (w, null) AND the bigram stream (w₁, w₂)
    * as one exploded column; one exchange on (doc, w₁, w₂) aggregates
    * both (null is a normal grouping value). The counts table feeds four
    * consumers (doc scoring, bigram model, context totals, unigram
    * backoff) and is persisted through `scope` — WITHOUT the persist,
    * Catalyst pushes each consumer's null-filter BELOW the aggregate,
    * the exchanges stop being identical, exchange reuse dies, and the
    * corpus is scanned three times (observed; Generate-count
    * plan-audited). The 100 TB variant writes counts to storage as the
    * model-training intermediate — same barrier, durable. Each model
    * joins back as a real table keyed on its words — never a forced
    * broadcast (a 100 TB corpus has ~10⁹ distinct bigrams). Only the
    * 1-row (N, V) frame broadcasts. */
  def bigramSurprisal(df: DataFrame, idCol: Column, toks: Column,
                      lambda: Double = 0.7,
                      scope: graft.operators.CacheScope =
                        graft.operators.CacheScope.unmanaged): DataFrame = {
    val pairStruct = "array<struct<w1:string,w2:string>>"
    // bind the caller's token expression ONCE as a lambda variable (the
    // transform(array(e), v => …) let idiom — see shingleHashArray):
    // element_at references it at 2 sites per position, and a spliced
    // tokenize expression would re-run per site after projection collapse
    val streams = flatten(transform(array(toks), tk => {
      val uniStream = transform(tk,
        t => struct(t.as("w1"), lit(null).cast("string").as("w2")))
      val biStream = when(size(tk) < 2, array().cast(pairStruct))
        .otherwise(transform(sequence(lit(1), size(tk) - 1),
          i => struct(element_at(tk, i).as("w1"), element_at(tk, i + 1).as("w2"))))
      concat(uniStream.cast(pairStruct), biStream)
    }))
    // one Generate per row carrying both streams; one exchange for both
    val counts = scope.persist(df.select(idCol.as("doc"),
        explode(streams).as("b"))
      .select(col("doc"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc", "w1", "w2").agg(count(lit(1)).as("c")))
    val docBi = counts.filter(col("w2").isNotNull)
    val uniCounts = counts.filter(col("w2").isNull)
      .groupBy(col("w1").as("token")).agg(sum(col("c")).as("cu"))
    val biModel = docBi.groupBy("w1", "w2").agg(sum(col("c")).as("cb"))
    val ctx = biModel.groupBy("w1").agg(sum(col("cb")).as("c1"))
    val totals = uniCounts.agg(sum(col("cu")).cast("double").as("N"),
      count(lit(1)).cast("double").as("V"))
    val p = lit(lambda) * (col("cb").cast("double") / col("c1")) +
      lit(1.0 - lambda) * ((col("cu").cast("double") + lit(1.0)) / (col("N") + col("V")))
    docBi.join(biModel, Seq("w1", "w2"))
      .join(ctx, "w1")
      .join(uniCounts.withColumnRenamed("token", "w2"), "w2")
      .crossJoin(broadcast(totals))
      .groupBy("doc")
      .agg((-sum(col("c") * log(p)) / sum(col("c"))).as("surprisal"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", reshaped to unigram
    * token features): for every document, the per-token mean log-ratio of
    * a TARGET unigram model (trained on the `isTarget` rows — the
    * high-quality subset the pipeline wants more of) to the RAW model
    * (trained on the whole corpus), exponentiated:
    *
    *   iw(d) = exp( Σ_t c_{d,t} · [ln p_tgt(t) − ln p_raw(t)] / n_d )
    *
    * Both models are add-one-smoothed over the SAME raw vocabulary, so
    * tokens unseen in the target still score. iw > 1 ⇒ the document
    * looks more like the target than the average corpus doc; feeding the
    * weights to [[graft.operators.Sampling.weightedTopN]] is importance
    * RESAMPLING — the distribution-shaping pass of a training-data
    * pipeline (upsample wiki-like text out of a web crawl).
    *
    * Scale shape: ONE explode pass → per-doc token counts (shuffle on
    * (doc, token), map-side combinable); the raw model, the target model,
    * and the scoring all derive from that single counts table (the target
    * model is a filtered re-aggregation, not a second corpus scan). The
    * counts table is persisted through `scope` — the same barrier as
    * [[bigramSurprisal]]: the target consumer's `_tgt` filter otherwise
    * pushes below the aggregate, exchange reuse dies, and the whole
    * upstream pipeline (which may be a gated/deduped composition, q106)
    * re-executes per consumer. Both models join back as real tables
    * keyed on token; only the 1-row totals frames broadcast —
    * [[unigramSurprisal]]'s discipline with two models instead of one. */
  def importanceWeights(df: DataFrame, idCol: Column, toks: Column,
                        isTarget: Column,
                        scope: graft.operators.CacheScope =
                          graft.operators.CacheScope.unmanaged): DataFrame = {
    val docCounts = scope.persist(df
      .select(idCol.as("doc"), isTarget.as("_tgt"), explode(toks).as("token"))
      .groupBy("doc", "token")
      .agg(count(lit(1)).as("c"), bool_or(col("_tgt")).as("_tgt")))
    val raw = docCounts.groupBy("token").agg(sum(col("c")).as("cr"))
    val tgt = docCounts.filter(col("_tgt")).groupBy("token").agg(sum(col("c")).as("ct"))
    val totals = raw.agg(sum(col("cr")).cast("double").as("Nr"),
      count(lit(1)).cast("double").as("V"))
    val tgtTotal = tgt.agg(coalesce(sum(col("ct")), lit(0L)).cast("double").as("Nt"))
    val logRatio =
      log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) / (col("Nt") + col("V"))) -
        log((col("cr").cast("double") + lit(1.0)) / (col("Nr") + col("V")))
    docCounts.join(raw, "token")
      .join(tgt, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(tgtTotal))
      .groupBy("doc")
      .agg(exp(sum(col("c") * logRatio) / sum(col("c"))).as("iw"))
  }
}
