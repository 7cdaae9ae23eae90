package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Media.MediaRow

/** Temporal structure ops: dense per-frame hashing, scene-cut detection,
  * keyframe selection, and audio activity segmentation — all against
  * PLANTED ground truth (a hard cut at a known frame via
  * [[MediaCodec.synthAviCut]], digital-silence gaps at known offsets via
  * [[MediaCodec.synthWavGapped]]) driven through the REAL codecs, so a
  * threshold that merely "passes on smooth video" cannot pass here. */
class MediaTemporalSpec extends SparkSpec {
  import spark.implicits._

  private val W = 64
  private val H = 48

  private def videoRow(id: Long, payload: Array[Byte], frames: Int): MediaRow =
    MediaRow(id, "video", payload, W, H, frames * 40L)

  private def audioRow(id: Long, payload: Array[Byte], ms: Long): MediaRow =
    MediaRow(id, "audio", payload, 0, 0, ms)

  // -------------------------------------------------------------- video

  test("withEveryFrameHash emits one row per container frame, in clock order") {
    val media = Seq(
      videoRow(1L, MediaCodec.synthAvi(7L, W, H, 8 * 40L), 8),
      videoRow(2L, MediaCodec.synthAvi(9L, W, H, 3 * 40L), 3)).toDS()
    val f = Media.withEveryFrameHash(media)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(f.count(_._1 == 1L) === 8)
    assert(f.count(_._1 == 2L) === 3)
    // 25 fps container clock: frame i sits at i·40 ms
    assert(f.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq === Seq(0L, 40L, 80L))
  }

  // Threshold for the grating family: a probed 81-video corpus separates
  // cleanly — adjacent-frame dHash hamming for the π/8 phase walk spans
  // 0..24 (p50 = 8), a seed change spans 25..41 (p50 = 38) — so 25 is
  // the exact decision boundary for this synthetic motion (real footage
  // sits far lower on the smooth side; the operator default stays 16).
  private val GratingCutThreshold = 25

  test("sceneCuts finds exactly the planted cut; smooth motion stays quiet") {
    val media = Seq(
      // hard cut at frame 4: different grating seed from there on
      videoRow(1L, MediaCodec.synthAviCut(3L, 5003L, W, H, 8, 4), 8),
      // smooth single-scene motion: phase walk only
      videoRow(2L, MediaCodec.synthAvi(11L, W, H, 8 * 40L), 8)).toDS()
    val cuts = Media.sceneCuts(media, threshold = GratingCutThreshold)
      .filter(col("is_cut")).select("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cuts === Set((1L, 0), (1L, 4), (2L, 0)))
  }

  test("sceneCutsFromHashes: frame 0 has null dist_prev; threshold monotone") {
    val media = Seq(videoRow(1L, MediaCodec.synthAviCut(3L, 5003L, W, H, 8, 4), 8)).toDS()
    val track = Media.withEveryFrameHash(media).cache()
    val low = Media.sceneCutsFromHashes(track, threshold = 1)
    val high = Media.sceneCutsFromHashes(track, threshold = GratingCutThreshold)
    val first = low.filter(col("frame_idx") === 0).collect().head
    assert(first.isNullAt(first.fieldIndex("dist_prev")))
    assert(first.getAs[Boolean]("is_cut"))
    val lowCuts = low.filter(col("is_cut")).select("frame_idx")
      .collect().map(_.getInt(0)).toSet
    val highCuts = high.filter(col("is_cut")).select("frame_idx")
      .collect().map(_.getInt(0)).toSet
    assert(highCuts.subsetOf(lowCuts))
    assert(highCuts === Set(0, 4))
    track.unpersist()
  }

  test("keyFrames matches sceneCutsFromHashes cut-for-cut and exports real JPEGs") {
    val media = Seq(
      videoRow(1L, MediaCodec.synthAviCut(3L, 5003L, W, H, 8, 4), 8),
      videoRow(2L, MediaCodec.synthAvi(11L, W, H, 6 * 40L), 6)).toDS()
    val fromHashes = Media.sceneCuts(media, threshold = GratingCutThreshold)
      .filter(col("is_cut")).select("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val kf = Media.keyFrames(media, threshold = GratingCutThreshold).collect()
    assert(kf.map(k => (k.media_id, k.frame_idx)).toSet === fromHashes)
    // the exported bytes are the container's REAL frames: they decode
    kf.foreach { k =>
      assert(MediaCodec.frameRaster(k.frame_bytes).isDefined,
        s"keyframe (${k.media_id}, ${k.frame_idx}) must decode")
    }
    // offsets follow the 25 fps container clock
    kf.foreach(k => assert(k.offset_ms === k.frame_idx * 40L))
  }

  test("an undecodable frame is skipped, not judged: cut chain bridges the hole") {
    // frames: [gratingA, garbage, gratingA] — the garbage frame is absent
    // from the track and frame 2 compares against frame 0's hash
    val good = MediaCodec.synthAvi(3L, W, H, 2 * 40L) // source of two A frames
    val track0 = Media.withEveryFrameHash(Seq(videoRow(9L, good, 2)).toDS())
      .collect()
    assert(track0.length === 2)
    val avi = MediaCodec.aviBytes(Seq(
      frameBytesOf(good, 0),
      Array[Byte](1, 2, 3, 4, 5),
      frameBytesOf(good, 0)), W, H)
    val media = Seq(videoRow(1L, avi, 3)).toDS()
    val rows = Media.sceneCuts(media, threshold = 8).collect()
    assert(rows.map(_.getInt(1)).toSet === Set(0, 2)) // frame 1 absent
    val f2 = rows.find(_.getInt(1) == 2).get
    assert(f2.getAs[Long]("dist_prev") === 0L) // identical to frame 0
    assert(!f2.getAs[Boolean]("is_cut"))
  }

  private def frameBytesOf(avi: Array[Byte], idx: Int): Array[Byte] =
    MediaCodec.decode(avi) match {
      case v: MediaCodec.VideoMjpeg => v.frames(idx)
      case other => fail(s"expected MJPEG, got $other")
    }

  // -------------------------------------------------------------- audio

  test("audioActivity recovers the planted tone/silence layout exactly") {
    // 2000 ms: tone [0,250) [500,750) [1000,1250) [1500,1750), gaps between
    val wav = MediaCodec.synthWavGapped(5L, 2000L, toneMs = 250L, gapMs = 250L)
    val segs = Media.audioActivity(Seq(audioRow(1L, wav, 2000L)).toDS(),
        windowMs = 50, minRms = 100.0)
      .orderBy("seg_idx").collect()
    assert(segs.length === 4)
    assert(segs.map(r => (r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"))).toSeq
      === Seq((0L, 250L), (500L, 750L), (1000L, 1250L), (1500L, 1750L)))
    assert(segs.forall(_.getAs[Long]("n_windows") === 5L))
    assert(segs.forall(_.getAs[Double]("mean_rms") > 100.0))
  }

  test("re-thresholding a persisted energy track flips segmentation without re-decode") {
    val wav = MediaCodec.synthWavGapped(5L, 2000L, toneMs = 250L, gapMs = 250L)
    val energy = Media.withAudioEnergy(Seq(audioRow(1L, wav, 2000L)).toDS(), 50).cache()
    // threshold 0 admits every window: one wall-to-wall segment
    val all = Media.audioActivityFromEnergy(energy, minRms = 0.0).collect()
    assert(all.length === 1)
    assert((all.head.getAs[Long]("start_ms"), all.head.getAs[Long]("end_ms"))
      === (0L, 2000L))
    // an impossibly high threshold admits none
    assert(Media.audioActivityFromEnergy(energy, minRms = 1e9).isEmpty)
    energy.unpersist()
  }

  test("tail partial window is emitted with a clamped end_ms") {
    // 1975 ms @ 8 kHz = 15800 samples; 50 ms windows of 400 → 39 full + 200
    val wav = MediaCodec.synthWav(5L, 1975L)
    val e = Media.withAudioEnergy(Seq(audioRow(1L, wav, 1975L)).toDS(), 50)
      .orderBy("win_idx").collect()
    assert(e.length === 40)
    assert(e.last.getAs[Long]("end_ms") === 1975L)
    // continuous tone: the segment covers the tail window too
    val segs = Media.audioActivityFromEnergy(
      Media.withAudioEnergy(Seq(audioRow(1L, wav, 1975L)).toDS(), 50), 100.0).collect()
    assert(segs.length === 1)
    assert(segs.head.getAs[Long]("end_ms") === 1975L)
  }

  test("temporalCard: exact hand-computed release summary; NULL ratios on empty") {
    // 2 clips × 3 frames: clip 1 cuts at frame 2 (plus both scene-start
    // firsts) → 3 cuts over 6 frames; 2 segments totaling 300 ms
    val cuts = Seq(
      (1L, 0, true), (1L, 1, false), (1L, 2, true),
      (2L, 0, true), (2L, 1, false), (2L, 2, false))
      .toDF("media_id", "frame_idx", "is_cut")
    val segs = Seq(
      (1L, 1L, 0L, 200L), (2L, 1L, 100L, 200L))
      .toDF("media_id", "seg_idx", "start_ms", "end_ms")
    val got = Media.temporalCard(cuts, segs).collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 6L &&
      got.getLong(2) == 3L, got.toString)
    assert(got.getLong(3) == 500000L, s"cut rate 3/6 ppm: $got")
    assert(got.getLong(4) == 2000000L, s"mean scene 6/3 frames: $got")
    assert(got.getLong(5) == 2L && got.getLong(6) == 2L &&
      got.getLong(7) == 300L, got.toString)
    assert(got.getLong(8) == 150000000L, s"mean seg 300/2 ms micro: $got")
    // empty tracks: ALL counts 0 (incl. the summed n_cuts/speech_ms),
    // ratios NULL — never a fake zero, never a NULL count
    val empty = Media.temporalCard(cuts.filter(lit(false)),
      segs.filter(lit(false))).collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.getLong(2) == 0L && empty.getLong(7) == 0L, empty.toString)
    assert(empty.isNullAt(3) && empty.isNullAt(4) && empty.isNullAt(8),
      empty.toString)
  }

  test("non-audio rows and digital silence produce no activity rows") {
    val silent = MediaCodec.synthWavGapped(5L, 500L, toneMs = 1L, gapMs = 100000L)
    val media = Seq(
      audioRow(1L, silent, 500L),
      videoRow(2L, MediaCodec.synthAvi(3L, W, H, 2 * 40L), 2)).toDS()
    // tone covers < one 50 ms window at the head; everything past it is 0 —
    // a minRms above the diluted head window leaves nothing
    val segs = Media.audioActivity(media, windowMs = 50, minRms = 2000.0)
    assert(segs.isEmpty)
  }
}
