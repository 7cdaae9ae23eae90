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
    val blockStart = col("masked") && col("pos") % blockTokens === 0
    val toks = df.select(idCol.as("doc"),
        posexplode(TextFunctions.tokens(textCol)).as(Seq("pos", "tok")))
      .withColumn("block", (col("pos") / blockTokens).cast("long"))
      .withColumn("masked",
        TextFunctions.portableHash(
          concat(col("doc").cast("string"), lit(":"), col("block")))
          % maskEvery === 0)
    // Sentinel ordinal as a RUNNING COUNT of masked block-starts in
    // token order, minus one — valid for every row of a masked block
    // (its own start precedes or equals it). The window partitions by
    // `doc` alone, the SAME key as the final aggregation, so the whole
    // operator is ONE hashpartitioning(doc) exchange; a
    // dense_rank-over-(doc, masked) formulation would insert a second.
    val byPos = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOrd = toks.withColumn("k",
      when(col("masked"),
        sum(when(blockStart, 1L).otherwise(0L)).over(byPos) - 1))
    val sentinel = concat(lit("<extra_id_"), col("k"), lit(">"))
    // One pass, three piece streams via null-skipping collect_list:
    // input = unmasked tokens + one sentinel per masked block (at its
    // first token); target = sentinel (sub 0, sorting before the block)
    // + the masked tokens (sub 1). sort_array over (pos, sub, piece)
    // restores token order regardless of aggregation arrival order.
    def piece(cond: Column, sub: Int, text: Column) =
      when(cond, struct(col("pos"), lit(sub).as("sub"), text.as("piece")))
    def sortedJoin(arr: Column) =
      array_join(transform(sort_array(arr), p => p.getField("piece")), " ")
    // a masked block-start row contributes TWO target pieces (sentinel
    // at sub 0, its token at sub 1) — hence two collect_lists per
    // output, concatenated and sorted together (collect_list skips the
    // null rows its `when` filters out)
    withOrd.groupBy("doc")
      .agg(
        sortedJoin(concat(
          collect_list(piece(!col("masked"), 0, col("tok"))),
          collect_list(piece(blockStart, 0, sentinel)))).as("input_text"),
        sortedJoin(concat(
          collect_list(piece(blockStart, 0, sentinel)),
          collect_list(piece(col("masked"), 1, col("tok"))))).as("target_text"),
        sum(when(blockStart, 1L).otherwise(0L)).as("n_masked"))
      .select(col("doc"), col("input_text"), col("target_text"),
        col("n_masked"))
  }

  /** Fill-in-the-middle reorder: split points `p1 <= p2` are the sorted
    * pair of two character-offset hash draws over [0, len), and the
    * emitted example is `<PRE>text[0,p1)<SUF>text[p2,len)<MID>text[p1,p2)`
    * (the PSM layout — suffix before middle, so generation continues
    * from the middle). Empty documents pass through with empty parts.
    * Pure per-row projection: substrings + concat, zero shuffles. */
  def fim(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val (p1, p2) = fimSplits(idCol, textCol)
    df.select(idCol.as("doc"), fimText(idCol, textCol).as("fim_text"),
      p1.as("p1"), p2.as("p2"))
  }

  private def fimSplits(idCol: Column, textCol: Column): (Column, Column) = {
    val len = length(textCol).cast("long")
    def draw(tag: String) =
      when(len > 0, TextFunctions.portableHash(
        concat(idCol.cast("string"), lit(s":$tag"))) % len).otherwise(0L)
    val a = draw("fim1"); val b = draw("fim2")
    (least(a, b), greatest(a, b))
  }

  /** Scalar form of [[fim]]'s rendered example — the `fim_text` column
    * as a pure (doc, text) function, exported to SQL as `fim_text`. */
  def fimText(idCol: Column, textCol: Column): Column = {
    val len = length(textCol).cast("long")
    val (p1, p2) = fimSplits(idCol, textCol)
    concat(lit("<PRE>"), textCol.substr(lit(1L), p1),
      lit("<SUF>"), textCol.substr(p2 + 1, len - p2),
      lit("<MID>"), textCol.substr(p1 + 1, p2 - p1))
  }

  /** Scalar twins of [[spanCorrupt]]'s `input_text` / `target_text` —
    * the same blocks, mask rule, sentinels, and spacing as the
    * DataFrame operator (parity is spec-pinned), but computed per-row
    * with HOF lambdas so they can register as SQL functions. The block
    * ordinal scan is O(blocks²) per document and the masked-block frame
    * re-evaluates at every lambda site — fine for the SQL convenience
    * tier on document-sized rows; corpus-scale span corruption goes
    * through [[spanCorrupt]] (one exchange, linear work). One edge
    * differs by construction: a document with NO tokens yields '' here
    * but no row at all from the explode-based operator. */
  def spanCorruptInput(idCol: Column, textCol: Column,
                       blockTokens: Int = 3, maskEvery: Int = 5): Column =
    spanCorruptScalar(idCol, textCol, blockTokens, maskEvery, target = false)

  /** See [[spanCorruptInput]]. */
  def spanCorruptTarget(idCol: Column, textCol: Column,
                        blockTokens: Int = 3, maskEvery: Int = 5): Column =
    spanCorruptScalar(idCol, textCol, blockTokens, maskEvery, target = true)

  /** Contrastive crop positives (the Contriever/cropping-style
    * objective): each document emits TWO deterministic crops that both
    * straddle the midpoint — `crop_a`/`crop_b` start at independent
    * hash draws in `[0, len/2]` and end at draws in `(len/2, len]` —
    * so the two views always share content (a genuine positive pair)
    * while their boundaries differ, which is exactly what a contrastive
    * embedding loss needs (identical views teach nothing; disjoint
    * views are false positives). Same determinism contract as [[fim]]:
    * crop selection is a pure function of (doc_id, text), so the
    * training set is DuckDB-replayable and reproduces byte-for-byte.
    * Documents shorter than 2 chars emit the full text on both sides
    * (no midpoint to straddle). Pure per-row projection, zero shuffle.
    *
    * Returns `(doc, crop_a, crop_b, a_start, a_end, b_start, b_end)`
    * with 0-based [start, end) character offsets. */
  def cropPairs(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val len = length(textCol).cast("long")
    val half = (len / 2).cast("long") // integer midpoint (Spark / is double)
    def draw(tag: String): Column = TextFunctions.portableHash(
      concat(idCol.cast("string"), lit(s":$tag")))
    def bounds(k: String): (Column, Column) = {
      val s = when(len >= 2, draw(s"crop$k:s") % (half + 1)).otherwise(0L)
      val e = when(len >= 2, half + 1 + draw(s"crop$k:e") % (len - half))
        .otherwise(len)
      (s, e)
    }
    val (as_, ae) = bounds("a")
    val (bs, be) = bounds("b")
    df.select(idCol.as("doc"),
      textCol.substr(as_ + 1, ae - as_).as("crop_a"),
      textCol.substr(bs + 1, be - bs).as("crop_b"),
      as_.as("a_start"), ae.as("a_end"), bs.as("b_start"), be.as("b_end"))
  }

  private def spanCorruptScalar(idCol: Column, textCol: Column,
                                blockTokens: Int, maskEvery: Int,
                                target: Boolean): Column = {
    require(blockTokens >= 1 && maskEvery >= 2,
      s"need blockTokens >= 1 and maskEvery >= 2, got $blockTokens/$maskEvery")
    val toks = TextFunctions.tokens(textCol)
    // block index domain [0, nBlocks): guarded so empty docs never build
    // a descending sequence(0, -1)
    val blocks = sequence(lit(0L),
      ((size(toks).cast("long") - 1L) / blockTokens).cast("long"))
    def isMasked(b: Column) = TextFunctions.portableHash(
      concat(idCol.cast("string"), lit(":"), b)) % maskEvery === 0
    val maskedBlocks = filter(blocks, isMasked(_))
    // sentinel ordinal = the block's position among masked blocks —
    // identical to the operator's running-count-minus-one
    def sentinel(b: Column) = concat(lit("<extra_id_"),
      size(filter(maskedBlocks, x => x < b)), lit(">"))
    def blockToks(b: Column) =
      slice(toks, (b * blockTokens + 1L).cast("int"), lit(blockTokens))
    val pieces =
      if (target)
        flatten(transform(maskedBlocks,
          b => concat(array(sentinel(b)), blockToks(b))))
      else
        flatten(transform(blocks,
          b => when(isMasked(b), array(sentinel(b)))
            .otherwise(blockToks(b))))
    when(size(toks) === 0, lit("")).otherwise(array_join(pieces, " "))
  }
}
