package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Media.MediaRow

class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  // planted embedding seam: matched pairs share a direction, mismatched
  // pairs are orthogonal, partial pairs sit in between
  private val ex = Seq(1.0, 0.0, 0.0)
  private val ey = Seq(0.0, 1.0, 0.0)
  private val mid = Seq(math.sqrt(0.5), math.sqrt(0.5), 0.0)

  test("alignmentGate: matched pairs rank above partial, mismatched gated out") {
    val pairs = Seq(
      (1L, "a cat on a mat", ex, ex),   // matched: cos 1.0
      (2L, "a dog in fog", ey, mid),    // partial: cos ~0.7071
      (3L, "unrelated caption", ex, ey) // mismatched: cos 0.0
    ).toDF("pair_id", "caption", "cap_vec", "img_vec")
    val got = CrossModal.alignmentGate(pairs, col("cap_vec"), col("img_vec"),
        minMicro = 3000L)
      .select("pair_id", "align_micro", "aligned")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 10000L, true)), got.toSeq.toString)
    assert(got(1)._2 == 7071L && got(1)._3, got.toSeq.toString)
    assert(got(2) == ((3L, 0L, false)), "mismatched pair must be gated out")
    assert(got(0)._2 > got(1)._2 && got(1)._2 > got(2)._2,
      "alignment must rank matched > partial > mismatched")
  }

  test("crossModalDedup over REAL dHash keys: only both-modality agreement collapses") {
    // three REAL PNGs: seeds 1 and 1 again (identical bytes -> identical
    // dHash), seed 99 (different texture). Captions arranged so every
    // agreement case is planted:
    //   p10/p11: same canonical caption + same image  -> dup (p11 collapses)
    //   p12:     same caption, DIFFERENT image        -> caption_reuse, NOT dup
    //   p13:     different caption, same image as p10 -> image_reuse,  NOT dup
    //   p14:     unique caption + unique image        -> untouched
    val img1a = MediaCodec.synthPng(1L, 64, 48)
    val img1b = MediaCodec.synthPng(1L, 64, 48)
    val img2 = MediaCodec.synthPng(99L, 64, 48)
    val img3 = MediaCodec.synthPng(7L, 64, 48)
    val media = Seq(
      MediaRow(10L, "image", img1a, 64, 48, 0L),
      MediaRow(11L, "image", img1b, 64, 48, 0L),
      MediaRow(12L, "image", img2, 64, 48, 0L),
      MediaRow(13L, "image", img1a, 64, 48, 0L),
      MediaRow(14L, "image", img3, 64, 48, 0L)).toDS()
    val captions = Seq(
      (10L, "A Cat  on the mat"),
      (11L, "a cat on the MAT"), // same canonical caption as p10
      (12L, "a cat on the mat"), // same caption, different image
      (13L, "sunset over water"),
      (14L, "one of a kind")).toDF("media_id", "caption")
    val pairs = captions.join(Media.withPerceptualHash(media), Seq("media_id"))
    val got = CrossModal.crossModalDedup(pairs, col("media_id"),
        col("caption"), col("phash"))
      .select("pair_id", "is_dup", "keeper", "caption_reuse", "image_reuse")
      .as[(Long, Boolean, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(10L) == ((false, 10L, true, true)), got.toString)  // keeper of its group
    assert(got(11L) == ((true, 10L, true, true)), got.toString)   // the planted dup
    assert(got(12L) == ((false, 12L, true, false)), got.toString) // caption reuse only
    assert(got(13L) == ((false, 13L, false, true)), got.toString) // image reuse only
    assert(got(14L) == ((false, 14L, false, false)), got.toString)
  }

  test("curateDelta: statuses priority-ordered, manifest round-trips across batches") {
    import org.apache.spark.sql.DataFrame
    def pairsOf(rows: Seq[(Long, String, Long, Seq[Double], Seq[Double])]): DataFrame =
      rows.toDF("pair_id", "caption", "img_key", "cap_vec", "img_vec")
    def curate(delta: DataFrame, index: DataFrame) =
      CrossModal.curateDelta(index, delta, col("pair_id"), col("caption"),
        col("cap_vec"), col("img_vec"), col("img_key"), minMicro = 5000L)
    // batch 1: two aligned pairs (one identity), one blocked
    val b1 = pairsOf(Seq(
      (1L, "a cat", 100L, ex, ex),       // kept (keeper of its identity)
      (2L, "A  CAT", 100L, ex, ex),      // dup_batch (same identity, larger id)
      (3L, "a cat", 100L, ex, ey)))      // blocked (misaligned) - same identity!
    val empty = pairsOf(Seq()).select("caption", "img_key")
      .select(graft.functions.TextFunctions.portableHash(col("caption")).as("cap_key"),
        col("img_key"))
    val r1 = curate(b1, empty).select("pair_id", "status")
      .as[(Long, String)].collect().toMap
    assert(r1 == Map(1L -> "kept", 2L -> "dup_batch", 3L -> "blocked"), r1.toString)
    // the blocked pair shares the kept identity — it must NOT have been
    // elected keeper (gate-first rule), which r1(1)=kept already proves
    // batch 2 classifies against batch 1's kept keys: the same identity
    // is now dup_index; a new identity is kept
    val keptKeys = CrossModal.manifestIndex(
      curate(b1, empty).filter(col("status") === "kept"))
    val b2 = pairsOf(Seq(
      (10L, "a CAT", 100L, ex, ex),      // dup_index (canonical caption + image match)
      (11L, "a dog", 200L, ex, ex)))     // kept (new identity)
    val r2 = curate(b2, keptKeys).select("pair_id", "status")
      .as[(Long, String)].collect().toMap
    assert(r2 == Map(10L -> "dup_index", 11L -> "kept"), r2.toString)
  }

  test("curatePairs end-to-end: gate drops before dedup; blocked pairs never elect keepers") {
    // p2 is a MISALIGNED copy of p1's (caption, image): if the gate ran
    // after the dedup, p2 (smaller id? no - p0) ... plant the blocked
    // pair with the SMALLEST id of its group, so a gate-after-dedup
    // formulation would elect the blocked pair as keeper and collapse
    // the aligned survivor — the ordering bug this test pins.
    val imgA = MediaCodec.synthPng(5L, 64, 48)
    val imgB = MediaCodec.synthPng(6L, 64, 48)
    val media = Seq(
      MediaRow(1L, "image", imgA, 64, 48, 0L),
      MediaRow(2L, "image", imgA, 64, 48, 0L),
      MediaRow(3L, "image", imgA, 64, 48, 0L),
      MediaRow(4L, "image", imgB, 64, 48, 0L)).toDS()
    val caps = Seq(
      (1L, "shared caption text", ex, ey),  // misaligned -> blocked
      (2L, "Shared   CAPTION text", ex, ex), // aligned, same group as 1,3
      (3L, "shared caption text", ex, ex),  // aligned dup of 2
      (4L, "another pair", mid, mid))       // aligned, unique
      .toDF("media_id", "caption", "cap_vec", "img_vec")
    val pairs = caps.join(Media.withPerceptualHash(media), Seq("media_id"))
    val got = CrossModal.curatePairs(pairs, col("media_id"), col("caption"),
        col("cap_vec"), col("img_vec"), col("phash"), minMicro = 5000L)
      .select("pair_id", "is_dup", "keeper")
      .as[(Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got.contains(1L), "blocked pair must not appear in the curated set")
    // keeper is the smallest ALIGNED id, not the blocked id 1
    assert(got(2L) == ((false, 2L)), got.toString)
    assert(got(3L) == ((true, 2L)), got.toString)
    assert(got(4L) == ((false, 4L)), got.toString)
  }
}
