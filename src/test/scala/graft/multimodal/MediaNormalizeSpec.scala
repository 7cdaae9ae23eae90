package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Media.MediaRow

/** Rate normalization: audio resampled to a fixed sample rate, video
  * re-timed to a fixed frame rate — duration-preserving, content
  * verified through the real decoders (tone frequency survives the
  * resample; re-timed frames are byte-pulls of the source frames). */
class MediaNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("resampledAudio: rate doubles, duration and tone frequency preserved") {
    val wav = MediaCodec.synthWav(5L, 1000L) // 8 kHz, 8000 samples
    val media = Seq(MediaRow(1L, "audio", wav, 0, 0, 1000L)).toDS()
    val out = Media.resampledAudio(media, 16000f).collect().head
    MediaCodec.decode(out.payload) match {
      case MediaCodec.AudioPcm(rate, samples) =>
        assert(rate === 16000f)
        assert(samples.length === 16000) // 1 s at the new rate
        // the tone's absolute frequency is unchanged: zero crossings per
        // second of the source and the resample agree within 1%
        def zcps(s: Array[Short], r: Float): Double = {
          var z = 0; var i = 1
          while (i < s.length) { if ((s(i) >= 0) != (s(i - 1) >= 0)) z += 1; i += 1 }
          z * r / s.length
        }
        val src = MediaCodec.decode(wav).asInstanceOf[MediaCodec.AudioPcm]
        val a = zcps(src.samples, src.sampleRate)
        val b = zcps(samples, rate)
        assert(math.abs(a - b) / a < 0.01, s"tone moved: $a vs $b crossings/s")
      case other => fail(s"expected PCM, got $other")
    }
  }

  test("resampledAudio: downsample halves the sample count; identity is a no-op") {
    val wav = MediaCodec.synthWav(7L, 500L) // 4000 samples @ 8 kHz
    val media = Seq(MediaRow(1L, "audio", wav, 0, 0, 500L)).toDS()
    val down = Media.resampledAudio(media, 4000f).collect().head
    MediaCodec.decode(down.payload) match {
      case MediaCodec.AudioPcm(rate, samples) =>
        assert(rate === 4000f && samples.length === 2000)
      case other => fail(s"expected PCM, got $other")
    }
    val same = Media.resampledAudio(media, 8000f).collect().head
    val a = MediaCodec.decode(same.payload).asInstanceOf[MediaCodec.AudioPcm]
    val b = MediaCodec.decode(wav).asInstanceOf[MediaCodec.AudioPcm]
    assert(a.samples.toSeq === b.samples.toSeq)
  }

  test("retimedVideo: 25 fps -> 50 fps duplicates frames; -> 5 fps drops them") {
    val avi = MediaCodec.synthAvi(3L, 48, 32, 8 * 40L) // 8 frames @ 25 fps
    val media = Seq(MediaRow(1L, "video", avi, 48, 32, 320L)).toDS()
    val src = MediaCodec.decode(avi).asInstanceOf[MediaCodec.VideoMjpeg]
    val up = Media.retimedVideo(media, 50).collect().head
    MediaCodec.decode(up.payload) match {
      case v: MediaCodec.VideoMjpeg =>
        assert(v.microsPerFrame === 20000L)
        assert(v.frames.length === 16) // 320 ms at 50 fps
        // each target tick pulls the covering source frame, byte-identical
        v.frames.zipWithIndex.foreach { case (f, i) =>
          val srcIdx = math.min(i * 20000L / 40000L, src.frames.length - 1).toInt
          assert(f.toSeq === src.frames(srcIdx).toSeq, s"tick $i")
        }
      case other => fail(s"expected MJPEG, got $other")
    }
    val down = Media.retimedVideo(media, 5).collect().head
    MediaCodec.decode(down.payload) match {
      case v: MediaCodec.VideoMjpeg =>
        assert(v.frames.length === 1) // 320 ms at 5 fps -> 1 tick
        assert(v.frames.head.toSeq === src.frames.head.toSeq)
      case other => fail(s"expected MJPEG, got $other")
    }
  }

  test("non-matching kinds and undecodable payloads pass through unchanged") {
    val junk = Array[Byte](9, 9, 9, 9)
    val rows = Seq(
      MediaRow(1L, "image", MediaCodec.synthPng(1L, 16, 16), 16, 16, 0L),
      MediaRow(2L, "audio", junk, 0, 0, 100L),
      MediaRow(3L, "video", junk, 16, 16, 100L)).toDS()
    val a = Media.resampledAudio(rows, 16000f).collect().sortBy(_.media_id)
    val v = Media.retimedVideo(rows, 50).collect().sortBy(_.media_id)
    rows.collect().sortBy(_.media_id).zip(a).foreach { case (x, y) =>
      assert(x.payload.toSeq === y.payload.toSeq) }
    rows.collect().sortBy(_.media_id).zip(v).foreach { case (x, y) =>
      assert(x.payload.toSeq === y.payload.toSeq) }
  }
}
