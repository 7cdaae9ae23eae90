package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Pretraining-objective data transforms — the step AFTER curation that
  * turns clean documents into training examples for denoising / infilling
  * objectives:
  *
  *  - [[spanCorrupt]]: T5/UL2-style span corruption — deterministic
  *    masked spans become `<extra_id_K>` sentinels in the input, and the
  *    target enumerates each sentinel followed by its masked content.
  *  - [[fim]]: fill-in-the-middle reordering (the code-model objective):
  *    two hash-drawn split points carve the document into
  *    prefix/middle/suffix, emitted `<PRE>…<SUF>…<MID>…` so the model
  *    learns to infill.
  *
  * Both are pure functions of (doc_id, text) — span/split selection is
  * hash-derived, NOT random — so every output is DuckDB-replayable and
  * hash-checked, the determinism discipline of the seeded-shuffle /
  * k-fold family (a re-run of the data pipeline must reproduce the
  * training set byte-for-byte; an RNG would silently fork corpora).
  *
  * Scale shape: [[fim]] is a per-row projection (zero shuffles).
  * [[spanCorrupt]] explodes tokens and reassembles per document — one
  * `hashpartitioning(doc)` exchange, groups bounded by document length
  * (the [[Instruct.render]] argument); the sentinel ordinal is a dense
  * rank over each document's masked BLOCKS (block-count-sized, not
  * token-sized).
  */
object Masking {

  /** T5-style span corruption. Tokens (whitespace split) are grouped
    * into fixed blocks of `blockTokens`; block b of document d is masked
    * iff `portableHash(d:b) % maskEvery == 0` (expected mask rate
    * 1/maskEvery). Per document:
    *
    *   input  = unmasked tokens, each masked block collapsed to ONE
    *            `<extra_id_K>` sentinel (K = the block's 0-based ordinal
    *            among the document's masked blocks, in token order)
    *   target = `<extra_id_K> tok… <extra_id_K+1> tok… …` — the
    *            sentinel-delimited masked content, the exact T5 target
    *            layout.
    *
    * Returns `(doc, input_text, target_text, n_masked)`. */
  def spanCorrupt(df: DataFrame, idCol: Column, textCol: Column,
                  blockTokens: Int = 3, maskEvery: Int = 5): DataFrame = {
    require(blockTokens >= 1 && maskEvery >= 2,
      s"need blockTokens >= 1 and maskEvery >= 2, got $blockTokens/$maskEvery")
    val toks = df.select(idCol.as("doc"),
        posexplode(TextFunctions.tokens(textCol)).as(Seq("pos", "tok")))
      .withColumn("block", (col("pos") / blockTokens).cast("long"))
      .withColumn("masked",
        TextFunctions.portableHash(
          concat(col("doc").cast("string"), lit(":"), col("block")))
          % maskEvery === 0)
    // sentinel ordinal per masked block: dense_rank over the document's
    // masked blocks in token order (block ids are ordered like tokens)
    val withOrd = toks.withColumn("k",
      when(col("masked"),
        dense_rank().over(
          Window.partitionBy(col("doc"), col("masked")).orderBy(col("block")))
          - 1))
    val sentinel = concat(lit("<extra_id_"), col("k"), lit(">"))
    // input pieces: unmasked tokens + one sentinel at each masked
    // block's first token (pos % blockTokens == 0 marks block starts)
    val inputPieces = withOrd.filter(!col("masked"))
      .select(col("doc"), struct(col("pos"), lit(0).as("sub"),
        col("tok").as("piece")).as("p"))
      .unionByName(withOrd
        .filter(col("masked") && col("pos") % blockTokens === 0)
        .select(col("doc"), struct(col("pos"), lit(0).as("sub"),
          sentinel.as("piece")).as("p")))
    // target pieces: sentinel at each masked block start (sub 0 sorts it
    // before the block's tokens at sub 1), then the masked tokens
    val targetPieces = withOrd
      .filter(col("masked") && col("pos") % blockTokens === 0)
      .select(col("doc"), struct(col("pos"), lit(0).as("sub"),
        sentinel.as("piece")).as("p"))
      .unionByName(withOrd.filter(col("masked"))
        .select(col("doc"), struct(col("pos"), lit(1).as("sub"),
          col("tok").as("piece")).as("p")))
    def assemble(pieces: DataFrame, out: String): DataFrame =
      pieces.groupBy("doc")
        .agg(array_join(transform(sort_array(collect_list(col("p"))),
          p => p.getField("piece")), " ").as(out))
    val nMasked = toks.filter(col("masked"))
      .select(col("doc"), col("block")).distinct()
      .groupBy("doc").agg(count(lit(1)).as("n_masked"))
    assemble(inputPieces, "input_text")
      .join(assemble(targetPieces, "target_text"), Seq("doc"), "left")
      .join(nMasked, Seq("doc"), "left")
      .select(col("doc"),
        col("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
  }

  /** Fill-in-the-middle reorder: split points `p1 <= p2` are the sorted
    * pair of two character-offset hash draws over [0, len), and the
    * emitted example is `<PRE>text[0,p1)<SUF>text[p2,len)<MID>text[p1,p2)`
    * (the PSM layout — suffix before middle, so generation continues
    * from the middle). Empty documents pass through with empty parts.
    * Pure per-row projection: substrings + concat, zero shuffles. */
  def fim(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val len = length(textCol).cast("long")
    def draw(tag: String) =
      when(len > 0, TextFunctions.portableHash(
        concat(idCol.cast("string"), lit(s":$tag"))) % len).otherwise(0L)
    val a = draw("fim1"); val b = draw("fim2")
    val p1 = least(a, b); val p2 = greatest(a, b)
    df.select(idCol.as("doc"),
      concat(lit("<PRE>"), textCol.substr(lit(1L), p1),
        lit("<SUF>"), textCol.substr(p2 + 1, len - p2),
        lit("<MID>"), textCol.substr(p1 + 1, p2 - p1)).as("fim_text"),
      p1.as("p1"), p2.as("p2"))
  }
}
