package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CacheScope
import graft.similarity.Similarity

/** Cross-modal pair curation — the LAION-style data product over
  * (caption, image) pairs that the multimodal family feeds: alignment
  * scoring through the embedding seam, modality-agreement dedup, and the
  * composed curation pipeline. Extension tier (the reference pipelines
  * are text-only: `/root/reference` has no image/caption surface); the
  * shapes follow the published web-scale pair-curation recipe —
  * CLIP-score gate, then dedup on BOTH modalities, because either alone
  * over-collapses (a template caption shared by thousands of distinct
  * images, or one image re-captioned across sites, are REUSE signals,
  * not duplicates).
  *
  * The embedding seam: caption/image vectors are COLUMNS (like the
  * classifier seam of q120 and the sentiment scorer) — production wires
  * a CLIP-style dual encoder in front; nothing downstream cares where
  * the vectors came from, which keeps every op here spec-testable and
  * oracle-expressible without a DL runtime. The image identity key is a
  * column too, so the REAL perceptual hash
  * ([[Media.withPerceptualHash]]'s 64-bit dHash) plugs straight in — the
  * spec composes exactly that.
  */
object CrossModal {

  /** Micro-quantized caption↔image alignment score:
    * `floor(round(cos, 4)·10⁴ + ε)` — the q124 floor-nudge discipline, so
    * gates are exact integer comparisons and the DuckDB twin is
    * bit-identical. Pure per-row arithmetic, zero shuffle. */
  def alignMicro(capVec: Column, imgVec: Column): Column =
    floor(round(Similarity.cosine(capVec, imgVec), 4) * 10000 + lit(0.001))
      .cast("long")

  /** Alignment gate: every pair keeps its verdict (`align_micro`,
    * `aligned`) — a curation pipeline records what it blocked (the
    * robotsGate audit-trail discipline); the caller filters when it
    * wants only the survivors. One codegen'd projection, zero shuffle,
    * so it composes into any scan. */
  def alignmentGate(pairs: DataFrame, capVecCol: Column, imgVecCol: Column,
                    minMicro: Long): DataFrame =
    pairs
      .withColumn("align_micro",
        alignMicro(capVecCol.cast("array<double>"), imgVecCol.cast("array<double>")))
      .withColumn("aligned", col("align_micro") >= minMicro)

  /** Cross-modal dedup: a pair is a duplicate iff BOTH modalities agree
    * — same canonical caption key AND same image key (`imgKeyCol`: the
    * dHash from [[Media.withPerceptualHash]], or any stable image
    * identity). Keeps the smallest `pair_id` per group; every row comes
    * back flagged (`is_dup`, `keeper`) plus the per-modality reuse audit
    * a single-modality dedup cannot express:
    *
    *  - `caption_reuse`: this caption appears with >1 distinct image
    *    (template/boilerplate captions — a quality signal, NOT a dup);
    *  - `image_reuse`: this image appears with >1 distinct caption
    *    (re-captioned/hotlinked image — ditto).
    *
    * Scale shape: captions are hashed to 8-byte keys BEFORE any
    * exchange (`portableHash ∘ canonicalize`), so the three aggregations
    * — composite group, per-caption image count, per-image caption
    * count — shuffle (key, key, id) triples only, never caption bodies;
    * all three are map-side-combinable aggregations joined back on
    * their keys (no corpus-keyed window, so a mega caption-key cannot
    * funnel through one task). The keyed frame has three readers —
    * persisted via `scope`. */
  def crossModalDedup(pairs: DataFrame, idCol: Column, captionCol: Column,
                      imgKeyCol: Column,
                      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    crossModalDedupKeyed(scope.persist(pairs.select(idCol.as("pair_id"),
      TextFunctions.portableHash(TextFunctions.canonicalize(captionCol))
        .as("cap_key"),
      imgKeyCol.as("img_key"))))

  /** [[crossModalDedup]] over an already-keyed (pair_id, cap_key,
    * img_key) frame — the caller persists it (three readers). */
  private def crossModalDedupKeyed(keyed: DataFrame): DataFrame = {
    val groups = keyed.groupBy("cap_key", "img_key")
      .agg(min("pair_id").as("keeper"), count(lit(1)).as("n_group"))
    val capReuse = keyed.groupBy("cap_key")
      .agg(count_distinct(col("img_key")).as("n_images"))
    val imgReuse = keyed.groupBy("img_key")
      .agg(count_distinct(col("cap_key")).as("n_captions"))
    keyed
      .join(groups, Seq("cap_key", "img_key"))
      .join(capReuse, Seq("cap_key"))
      .join(imgReuse, Seq("img_key"))
      .select(col("pair_id"), col("cap_key"), col("img_key"),
        (col("pair_id") =!= col("keeper")).as("is_dup"), col("keeper"),
        (col("n_images") > 1).as("caption_reuse"),
        (col("n_captions") > 1).as("image_reuse"))
  }

  /** Persistable manifest index of a curated pair set: the distinct
    * `(cap_key, img_key)` identities — 8-byte keys only, pair bodies
    * never persist — that [[curateDelta]] classifies arriving batches
    * against (the [[graft.dedup.Dedup.buildIndex]] economics: the
    * curated corpus is keyed once; every later batch joins the stored
    * keys). Accepts any frame carrying `cap_key`/`img_key` columns —
    * canonically [[curatePairs]] output filtered to the kept set (the
    * key set of the kept rows equals the key set of ALL aligned rows,
    * since every group elects exactly one keeper). */
  def manifestIndex(curated: DataFrame): DataFrame =
    curated.select("cap_key", "img_key").distinct()

  /** Incremental pair curation — the multi-batch shape: a new batch of
    * (caption, image) pairs classifies against a PRECOMPUTED
    * [[manifestIndex]]. Per delta pair, priority-ordered:
    *
    *  - `blocked`: failed the alignment gate (misaligned pairs never
    *    consult the index — and never elect within-batch keepers, the
    *    [[curatePairs]] ordering rule);
    *  - `dup_index`: aligned, but its identity is already curated;
    *  - `dup_batch`: aligned, identity new to the index, but another
    *    batch pair with the same identity has the smaller id;
    *  - `kept`: the batch's contribution to the manifest — append these
    *    keys to the index for the next round.
    *
    * Scale shape: the index side is keys-only (16 bytes/row); the
    * membership check is ONE left-semi equi-join on the composite key
    * and the within-batch election ONE map-side-combinable min — both
    * hash-spread, no window, batch text hashed to 8-byte keys before
    * any exchange. */
  def curateDelta(index: DataFrame, delta: DataFrame, idCol: Column,
                  captionCol: Column, capVecCol: Column, imgVecCol: Column,
                  imgKeyCol: Column, minMicro: Long,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val gated = scope.persist(
      alignmentGate(delta, capVecCol, imgVecCol, minMicro)
        .select(idCol.as("pair_id"),
          TextFunctions.portableHash(TextFunctions.canonicalize(captionCol))
            .as("cap_key"),
          imgKeyCol.as("img_key"), col("align_micro"), col("aligned")))
    val aligned = gated.filter(col("aligned"))
    val inIndex = aligned
      .join(index.select(col("cap_key"), col("img_key")).distinct(),
        Seq("cap_key", "img_key"), "left_semi")
      .select(col("pair_id")).withColumn("_idx", lit(1))
    val batchKeeper = aligned.groupBy("cap_key", "img_key")
      .agg(min("pair_id").as("_keeper"))
    gated
      .join(inIndex, Seq("pair_id"), "left")
      .join(batchKeeper, Seq("cap_key", "img_key"), "left")
      .select(col("pair_id"), col("cap_key"), col("img_key"),
        col("align_micro"),
        when(!col("aligned"), "blocked")
          .when(col("_idx") === 1, "dup_index")
          .when(col("pair_id") =!= col("_keeper"), "dup_batch")
          .otherwise("kept").as("status"))
  }

  /** The composed curation pipeline — alignment gate, then cross-modal
    * dedup over the survivors: the curated pair set plus its audit
    * columns, ready to feed a training-manifest sink. Output one row
    * per ALIGNED pair (`is_dup` marks the collapse; `kept = aligned ∧
    * ¬is_dup` is the manifest predicate), ordered nowhere — the caller
    * sorts if it sinks to a deterministic artifact. The gate runs
    * before the dedup on purpose: misaligned pairs must not elect a
    * dedup keeper (a blocked pair "winning" its group would silently
    * drop the aligned duplicate that should have survived). */
  def curatePairs(pairs: DataFrame, idCol: Column, captionCol: Column,
                  capVecCol: Column, imgVecCol: Column, imgKeyCol: Column,
                  minMicro: Long,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // captions hash to 8-byte keys BEFORE the persist — the cached
    // frame carries keys, never caption bodies (the collapse-persist
    // lesson: persist the slim projection the stages re-read)
    val gated = scope.persist(
      alignmentGate(pairs, capVecCol, imgVecCol, minMicro)
        .select(idCol.as("pair_id"),
          TextFunctions.portableHash(TextFunctions.canonicalize(captionCol))
            .as("cap_key"),
          imgKeyCol.as("img_key"), col("align_micro"), col("aligned")))
    val flags = crossModalDedupKeyed(gated.filter(col("aligned"))
      .select("pair_id", "cap_key", "img_key"))
    gated.filter(col("aligned"))
      .select(col("pair_id"), col("align_micro"))
      .join(flags, Seq("pair_id"))
      .select(col("pair_id"), col("cap_key"), col("img_key"),
        col("align_micro"), col("is_dup"), col("keeper"),
        col("caption_reuse"), col("image_reuse"))
  }
}
