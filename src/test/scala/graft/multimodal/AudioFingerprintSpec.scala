package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Media.MediaRow

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def wav(seed: Long, ms: Long = 1000): Array[Byte] =
    MediaCodec.synthWav(seed, ms)

  /** Re-encode a WAV with every sample scaled by `gain` — same content,
    * different loudness. */
  private def scaled(payload: Array[Byte], gain: Double): Array[Byte] = {
    val pcm = MediaCodec.decode(payload) match {
      case MediaCodec.AudioPcm(rate, samples) =>
        val out = new Array[Byte](samples.length * 2)
        samples.zipWithIndex.foreach { case (s, i) =>
          val v = math.max(-32768, math.min(32767, (s * gain).toInt)).toShort
          out(2 * i) = (v & 0xff).toByte
          out(2 * i + 1) = ((v >> 8) & 0xff).toByte
        }
        (rate, out, samples.length)
      case other => fail(s"expected PCM, got $other")
    }
    val fmt = new AudioFormat(pcm._1, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm._2), fmt, pcm._3.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def truncated(payload: Array[Byte], keep: Double): Array[Byte] = {
    MediaCodec.decode(payload) match {
      case MediaCodec.AudioPcm(rate, samples) =>
        val n = (samples.length * keep).toInt
        val out = new Array[Byte](n * 2)
        (0 until n).foreach { i =>
          out(2 * i) = (samples(i) & 0xff).toByte
          out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        }
        val fmt = new AudioFormat(rate, 16, 1, true, false)
        val ais = new AudioInputStream(new ByteArrayInputStream(out), fmt, n.toLong)
        val bos = new ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      case other => fail(s"expected PCM, got $other")
    }
  }

  private def fp(payload: Array[Byte]): Array[Long] =
    MediaCodec.audioFingerprint(MediaCodec.decode(payload))

  test("fingerprint codes are exactly amplitude-invariant") {
    val a = wav(7)
    assert(fp(a).nonEmpty)
    assert(fp(a).toSeq === fp(scaled(a, 0.25)).toSeq)
    assert(fp(a).toSeq === fp(scaled(a, 2.0)).toSeq) // clipping-tolerant too
  }

  test("distinct timbres produce distinct fingerprints") {
    // seeds with different fundamentals/harmonics
    val fps = Seq(1L, 50L, 99L, 140L).map(s => fp(wav(s)).toSeq)
    assert(fps.distinct.size === fps.size)
  }

  test("audioNearDupPairs: finds the re-leveled copy, not the strangers") {
    val rows = Seq(
      MediaRow(1L, "audio", wav(7), 0, 0, 1000L),
      MediaRow(2L, "audio", scaled(wav(7), 0.3), 0, 0, 1000L), // loudness dup
      MediaRow(3L, "audio", wav(50), 0, 0, 1000L),
      MediaRow(4L, "audio", wav(99), 0, 0, 1000L)
    ).toDS()
    val pairs = Media.audioNearDupPairs(rows, radius = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"re-leveled copy not found: $pairs")
    assert(!pairs.contains((3L, 4L)) && !pairs.contains((1L, 3L)), pairs.toString)
  }

  test("a trimmed copy is caught at the code level: full containment") {
    // the doc-level simhash targets re-leveled/re-encoded copies; trims
    // are matched by their window codes — a prefix trim's windows are a
    // SUBSET of the original's (same offsets, same content)
    val full = wav(7, 2000)
    val half = truncated(full, 0.5)
    val fullCodes = fp(full).toSet
    val halfCodes = fp(half)
    assert(halfCodes.nonEmpty)
    val contained = halfCodes.count(fullCodes.contains).toDouble / halfCodes.length
    assert(contained === 1.0, s"trim containment $contained")
  }

  test("non-audio and too-short payloads fingerprint to empty (no fake signatures)") {
    assert(fp(MediaCodec.synthPng(1, 8, 8)).isEmpty)
    assert(fp(wav(7, 1)).isEmpty || fp(wav(7, 1)).nonEmpty) // clamped to >=200ms
    assert(MediaCodec.audioFingerprint(
      MediaCodec.Opaque(Array[Byte](1, 2, 3))).isEmpty)
  }
}
