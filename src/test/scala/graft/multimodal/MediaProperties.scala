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
}
