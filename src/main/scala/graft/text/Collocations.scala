package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation mining: adjacent-token bigram counts and pointwise mutual
  * information — the corpus-statistics pass behind phrase detection
  * ("new york" is a unit, "the cat" is chance adjacency).
  *
  * Scale shape: bigrams come from a per-row zip of the token array with
  * itself shifted by one (`arrays_zip(slice, slice)` → explode) — no join,
  * no window, no shuffle to FORM pairs; the only shuffles are the two
  * grouped counts (unigrams, bigrams), both map-side combinable, plus the
  * marginal-attach joins — left unhinted so AQE broadcasts the vocabulary
  * when it fits and falls back to a shuffle join when a 100 TB corpus's
  * vocabulary doesn't. Corpus totals ride in as broadcast single-row
  * frames.
  *
  * PMI = ln(p(w1,w2) / (p(w1)·p(w2))), computed as
  * ln((nb·N1·N1) / (N2·n1·n2)) with every operand cast to double before
  * multiplying and the parenthesization fixed — exact integer-valued
  * doubles below 2^53 make the expression bit-reproducible, so the DuckDB
  * oracle (same parens, `ln`) matches to the ULP and survives rounding.
  */
object Collocations {

  def bigramPmi(df: DataFrame, toksCol: Column, minCount: Long = 5L): DataFrame = {
    val toks = df.select(toksCol.as("tk"))
    // greatest(size-1, 0): slice throws on a negative length, and an
    // empty token array must yield no bigrams, not a runtime error
    val nBi = greatest(size(col("tk")) - 1, lit(0))
    val bigrams = toks
      .withColumn("a", slice(col("tk"), lit(1), nBi))
      .withColumn("b", slice(col("tk"), lit(2), nBi))
      .select(explode(arrays_zip(col("a"), col("b"))).as("bg"))
      .select(col("bg.a").as("w1"), col("bg.b").as("w2"))

    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_uni"))
    val n1 = uni.agg(sum(col("n_uni")).as("N1"))

    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("n_big"))
      .filter(col("n_big") >= minCount)
    // |bigrams| = Σ max(|tk|-1, 0) — a cheap per-row aggregate over the
    // token arrays, NOT a second explode pass over the corpus
    val n2 = toks.agg(sum(nBi.cast("long")).as("N2"))

    bi
      .join(uni.select(col("w").as("w1"), col("n_uni").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_uni").as("c2")), "w2")
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .withColumn("pmi",
        log((col("n_big").cast("double") * col("N1").cast("double") * col("N1").cast("double"))
          / (col("N2").cast("double") * col("c1").cast("double") * col("c2").cast("double"))))
      .select("w1", "w2", "n_big", "pmi")
  }
}
