package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking and vocabulary-coverage passes of a training/RAG
  * pipeline: fixed-size overlapping windows, and out-of-vocabulary rates
  * against a frequency-ranked vocabulary.
  */
object Chunking {

  /** Fixed-size overlapping token chunks — split every doc into
    * `chunkSize`-token windows every `stride` tokens. Pure per-row
    * generator: explode a start-offset sequence, slice the token array
    * per offset — no shuffle, no state, chunk ids dense per doc. The
    * final short chunk is kept (standard chunking semantics; callers
    * filter on `chunk_len` if not wanted). */
  def chunkTokens(df: DataFrame, idCol: Column, toksCol: Column,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize=$chunkSize stride=$stride must be positive")
    // guard: sequence(1, 0) throws ("illegal boundaries") on an empty
    // token array — a doc with no tokens must yield no chunks (explode
    // drops the null), matching DuckDB's empty generate_series
    df.select(idCol.as("doc"), toksCol.as("tk"))
      .select(col("doc"),
        posexplode(when(size(col("tk")) >= 1,
          sequence(lit(1), size(col("tk")), lit(stride))))
          .as(Seq("chunk_id", "start")),
        col("tk"))
      .select(col("doc"), col("chunk_id"),
        concat_ws(" ", slice(col("tk"), col("start"), lit(chunkSize))).as("chunk"),
        least(size(col("tk")) - col("start") + 1, lit(chunkSize))
          .cast("long").as("chunk_len"))
  }

  /** Per-doc out-of-vocabulary rate against the corpus's top-`vocabSize`
    * tokens by frequency (ties broken by token for determinism). Two
    * grouped counts; the vocabulary itself is selected with orderBy+limit
    * (plans as TakeOrderedAndProject — per-partition bounded heaps, NOT
    * the single-task global sort a row_number window would pay on a
    * 100 TB-corpus vocabulary), then broadcast into a left join against
    * per-doc token counts — bounded at `vocabSize` rows by construction.
    * OOV mass is weighted by occurrence, not distinct tokens. */
  def oovRate(df: DataFrame, idCol: Column, toksCol: Column,
              vocabSize: Int): DataFrame = {
    val pairs = df.select(idCol.as("doc"), explode(toksCol).as("token"))
    val vocab = pairs.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(true).as("in_vocab"))
    pairs.groupBy("doc", "token").agg(count(lit(1)).as("c"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc")
      .agg((sum(when(col("in_vocab").isNull, col("c")).otherwise(0L))
        / sum(col("c"))).as("oov_rate"))
  }

  /** The frequency-ranked vocabulary prefix covering ≤ `coverage` of the
    * corpus token mass — the tokenizer-budget question ("how many types
    * cover 90% of tokens?") a vocab build answers before training.
    * Returns (token, cnt, cum_frac) for every token whose CUMULATIVE
    * mass (in count-desc, token-asc total order) stays within
    * `coverage`.
    *
    * Scale shape: one grouped count over the exploded corpus (the only
    * corpus-sized shuffle), then the running sum over the AGGREGATED
    * vocabulary — the same deliberately-global post-aggregation window
    * as q19/q90 (bounded by |vocab|, not the corpus; a 100 TB corpus
    * has a few-million-row vocabulary). The 1-row total broadcasts. */
  def vocabCoverage(df: DataFrame, toksCol: Column, coverage: Double): DataFrame = {
    require(coverage > 0 && coverage <= 1, s"coverage must be in (0,1], got $coverage")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vocab = df.select(explode(toksCol).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("n_total"))
    vocab.crossJoin(broadcast(total))
      .withColumn("cum_frac", sum(col("cnt")).over(w) / col("n_total"))
      .filter(col("cum_frac") <= coverage)
      .select(col("token"), col("cnt"), round(col("cum_frac"), 6).as("cum_frac"))
  }
}
