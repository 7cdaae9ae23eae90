package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure (no-Spark) media container logic. */
object MediaProperties extends Properties("graft.multimodal") {

  private val frame: Gen[Array[Byte]] =
    Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("AVI write->parse round-trips arbitrary frame payloads byte-exactly") =
    Prop.forAll(Gen.nonEmptyListOf(frame), Gen.chooseNum(1, 128),
      Gen.chooseNum(1, 128), Gen.chooseNum(1000L, 100000L)) { (frames, w, h, mpf) =>
      MediaCodec.decode(MediaCodec.aviBytes(frames, w, h, mpf)) match {
        case MediaCodec.VideoMjpeg(m, fs) =>
          m == mpf && fs.length == frames.length &&
            fs.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }
        case _ => false
      }
    }

  property("frameOf indexes by time and clamps to the last frame") =
    Prop.forAll(Gen.nonEmptyListOf(frame), Gen.chooseNum(0L, 10000L)) { (frames, offMs) =>
      val mpf = 40000L
      val avi = MediaCodec.aviBytes(frames, 8, 8, mpf)
      val want = frames(((offMs * 1000 / mpf) min (frames.length - 1L)).toInt)
      java.util.Arrays.equals(MediaCodec.frameAt(avi, offMs), want)
    }

  property("decode never throws on arbitrary byte soup (quarantines instead)") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      MediaCodec.decode(bytes.toArray) match {
        case _: MediaCodec.Decoded => true
      }
    }

  property("deeply nested LIST chains quarantine instead of overflowing the stack") =
    Prop.forAll(Gen.chooseNum(100, 20000)) { levels =>
      // a crafted RIFF('AVI ') of back-to-back LIST headers, one nesting
      // level per 12 bytes — random soup never generates this shape, and
      // without a depth bound it recursed once per level
      val out = new java.io.ByteArrayOutputStream()
      def word(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def le32(v: Int): Unit =
        out.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
      val total = 12 + 12 * levels
      word("RIFF"); le32(total - 8); word("AVI ")
      (0 until levels).foreach { i =>
        word("LIST"); le32(total - 12 * (i + 1) - 8); word("lst ")
      }
      MediaCodec.decode(out.toByteArray) match {
        case _: MediaCodec.VideoMjpeg => false // no frames in there
        case _ => true                         // quarantined, no throw
      }
    }

  property("stripMetadata never throws and never grows a payload") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val out = MediaCodec.stripMetadata(bytes.toArray)
      out.length <= math.max(bytes.length, 12) // RIFF header floor
    }

  private val printable: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(64))

  property("PNG: planted tEXt of arbitrary content strips; pixels identical") =
    Prop.forAll(Gen.chooseNum(1L, 5000L), Gen.chooseNum(8, 64),
      Gen.chooseNum(8, 64), printable, printable) { (seed, w, h, key, value) =>
      val clean = MediaCodec.synthPng(seed, w, h)
      val scrubbed = MediaCodec.stripMetadata(
        MediaCodec.withPngText(clean, key, value))
      (MediaCodec.decode(scrubbed), MediaCodec.decode(clean)) match {
        case (a: MediaCodec.ImageRaster, b: MediaCodec.ImageRaster) =>
          !new String(scrubbed, "ISO-8859-1").contains("tEXt") &&
            java.util.Arrays.equals(a.pixels, b.pixels)
        case _ => false
      }
    }

  property("WAV: planted INFO of arbitrary content strips; samples identical") =
    Prop.forAll(Gen.chooseNum(1L, 5000L), Gen.chooseNum(200L, 1500L),
      printable) { (seed, ms, artist) =>
      val clean = MediaCodec.synthWav(seed, ms)
      val scrubbed = MediaCodec.stripMetadata(
        MediaCodec.withRiffInfo(clean, artist))
      (MediaCodec.decode(scrubbed), MediaCodec.decode(clean)) match {
        case (a: MediaCodec.AudioPcm, b: MediaCodec.AudioPcm) =>
          java.util.Arrays.equals(a.samples.map(_.toInt), b.samples.map(_.toInt))
        case _ => false
      }
    }

  property("resamplePcm: identity at equal rates; length = ceil(n*dst/src)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue, Short.MaxValue)),
      Gen.chooseNum(2000, 48000), Gen.chooseNum(2000, 48000)) { (xs, src, dst) =>
      val s = xs.map(_.toShort).toArray
      val out = MediaCodec.resamplePcm(s, src.toFloat, dst.toFloat)
      val wantLen = math.ceil(s.length.toDouble * dst / src).toInt
      (src != dst || (out eq s)) && (src == dst || out.length == wantLen)
    }

  property("pcmToWav -> decode round-trips samples byte-exactly") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue, Short.MaxValue)),
      Gen.oneOf(8000f, 16000f, 44100f)) { (xs, rate) =>
      val s = xs.map(_.toShort).toArray
      MediaCodec.decode(MediaCodec.pcmToWav(s, rate)) match {
        case MediaCodec.AudioPcm(r, got) =>
          r == rate && java.util.Arrays.equals(got.map(_.toInt), s.map(_.toInt))
        case _ => false
      }
    }
}
