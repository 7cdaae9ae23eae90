package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class MediaSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Media.synthesize(Tables.documents(spark, sfDir)).cache()

  test("synthesized media has typed schema and all three kinds") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "width", "height", "duration_ms"))
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.select("kind").distinct().count() == 3)
  }

  test("decodeFeatures is deterministic and preserves row count") {
    val f1 = Media.decodeFeatures(media)
    val f2 = Media.decodeFeatures(media)
    assert(f1.count() == media.count())
    val j = f1.toDF().select($"media_id", $"checksum".as("c1"))
      .join(f2.toDF().select($"media_id", $"checksum".as("c2")), "media_id")
    assert(j.filter($"c1" =!= $"c2").count() == 0)
  }

  test("feature vectors have the requested dimension and finite values") {
    val f = Media.decodeFeatures(media, dim = 8)
    val sizes = f.toDF().select(size($"feature").as("s")).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(8))
    assert(f.toDF().filter(exists($"feature", v => v.isNaN || v < 0)).count() == 0)
  }

  test("decode stage preserves partitioning (no shuffle in the plan)") {
    val input = media.repartition(7)
    val planned = Media.decodeFeatures(input).toDF()
    assert(planned.rdd.getNumPartitions == 7)
    // decode adds no exchange beyond whatever the input already plans
    // (the explicit repartition(7) + any source parallelism repair)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(planned) == exchanges(input.toDF()),
      s"unexpected shuffle:\n${planned.queryExecution.executedPlan}")
  }

  test("resized re-encodes real PNGs at the new dimensions, metadata in sync") {
    val r = Media.resized(media, 16, 16)
    val img = r.filter($"kind" === "image")
    assert(img.filter($"width" =!= 16 || $"height" =!= 16).count() == 0)
    // every image payload is a genuine PNG that decodes at the new size
    val badDims = img.collect().count { row =>
      MediaCodec.decode(row.payload) match {
        case MediaCodec.ImageRaster(w, h, _) => !(w == 16 && h == 16)
        case _ => true
      }
    }
    assert(badDims == 0)
    // non-image rows pass through untouched
    val others = r.filter($"kind" =!= "image").toDF()
      .select($"media_id", $"width".as("w2"))
      .join(media.toDF().select($"media_id", $"width"), "media_id")
    assert(others.filter($"w2" =!= $"width").count() == 0)
  }

  test("image payloads are real PNGs; decode recovers exact pixels") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // hand-build a 3x2 grayscale PNG with known pixel values
    val bi = new BufferedImage(3, 2, BufferedImage.TYPE_BYTE_GRAY)
    val vals = Array(0, 64, 128, 192, 255, 7)
    for (y <- 0 until 2; x <- 0 until 3) bi.getRaster.setSample(x, y, 0, vals(y * 3 + x))
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(bi, "png", out)
    MediaCodec.decode(out.toByteArray) match {
      case MediaCodec.ImageRaster(w, h, px) =>
        assert(w == 3 && h == 2)
        assert(px.map(_ & 0xff).toSeq == vals.toSeq)
      case other => fail(s"expected ImageRaster, got $other")
    }
    // and the synthesized corpus's image rows decode at their declared dims
    val imgs = media.filter($"kind" === "image").collect()
    assert(imgs.nonEmpty)
    assert(imgs.forall { r =>
      MediaCodec.decode(r.payload) match {
        case MediaCodec.ImageRaster(w, h, _) => w == r.width && h == r.height
        case _ => false
      }
    })
  }

  test("audio payloads are real WAVs; decode round-trips the exact PCM") {
    val auds = media.filter($"kind" === "audio").collect()
    assert(auds.nonEmpty)
    auds.foreach { r =>
      MediaCodec.decode(r.payload) match {
        case MediaCodec.AudioPcm(rate, samples) =>
          assert(rate == 8000f)
          val expectMs = r.duration_ms.max(200L).min(2000L)
          assert(samples.length == (8000L * expectMs / 1000).toInt)
        case other => fail(s"expected AudioPcm for id=${r.media_id}, got $other")
      }
    }
    // non-circular round-trip: re-derive one doc's waveform from the
    // documented formula and demand the WAV decode matches sample-exact
    val q = auds.minBy(_.media_id)
    val seed = q.media_id
    val f0 = 150.0 + math.floorMod(seed, 211L) * 5.0
    val h2 = math.floorMod(seed, 13L) / 20.0
    val h3 = math.floorMod(seed, 31L) / 40.0
    val amp = (0.25 + math.floorMod(seed, 89L) * 0.004) / (1.0 + h2 + h3)
    val MediaCodec.AudioPcm(_, got) = MediaCodec.decode(q.payload): @unchecked
    val want = (0 until got.length).map { i =>
      val t = 2 * math.Pi * f0 * i / 8000.0
      ((math.sin(t) + h2 * math.sin(2 * t) + h3 * math.sin(3 * t)) * amp * 32767).toInt.toShort
    }
    assert(got.toSeq == want, "WAV encode→decode must be PCM-lossless")
  }

  test("frameAt on audio is a real PCM seek, not a byte slice") {
    val r = media.filter($"kind" === "audio").orderBy($"media_id").head()
    val MediaCodec.AudioPcm(rate, samples) = MediaCodec.decode(r.payload): @unchecked
    val offMs = 100L
    val idx = (offMs * rate / 1000).toInt
    val frame = MediaCodec.frameAt(r.payload, offMs)
    val want = (0 until 4).flatMap { i =>
      val s = samples(idx + i)
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }
    assert(frame.toSeq == want, s"frame=${frame.toSeq} want=$want")
  }

  test("nearestMedia over audio: a near-identical tone ranks first") {
    val q = media.filter($"kind" === "audio").orderBy($"media_id").head()
    // twin: same WAV with one sample nudged — audibly identical, distinct bytes
    val twinBytes = q.payload.clone()
    twinBytes(q.payload.length - 1) = (twinBytes(q.payload.length - 1) ^ 1).toByte
    assert(!java.util.Arrays.equals(twinBytes, q.payload))
    val twin = spark.createDataset(Seq(
      q.copy(media_id = 900003L, payload = twinBytes)))(media.encoder)
    val top = Media.nearestMedia(media.union(twin), queryId = q.media_id, k = 3).collect()
    assert(top.head.getLong(0) == 900003L, top.mkString(";"))
    assert(top.head.getDouble(1) > 0.9999)
  }

  test("nearestMedia ranks a visually-identical image first despite distinct PNG bytes") {
    import java.awt.image.{BufferedImage, DataBufferByte}
    import javax.imageio.ImageIO
    val q = media.filter($"kind" === "image").orderBy($"media_id").head()
    val MediaCodec.ImageRaster(dw, dh, dpx) = MediaCodec.decode(q.payload): @unchecked
    // twin: same image with one pixel toggled by 1 luma step — visually
    // identical, but the PNG byte stream differs from the original
    val bi = new BufferedImage(dw, dh, BufferedImage.TYPE_BYTE_GRAY)
    val px = bi.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    System.arraycopy(dpx, 0, px, 0, dpx.length)
    px(0) = (px(0) ^ 1).toByte
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(bi, "png", out)
    val twinBytes = out.toByteArray
    assert(!java.util.Arrays.equals(twinBytes, q.payload))
    val twin = spark.createDataset(Seq(
      q.copy(media_id = 900002L, payload = twinBytes)))(media.encoder)
    val top = Media.nearestMedia(media.union(twin), queryId = q.media_id, k = 3).collect()
    assert(top.head.getLong(0) == 900002L, top.mkString(";"))
    assert(top.head.getDouble(1) > 0.9999)
  }

  test("nearestMedia composes the codec seam with knn: self-similar dup found first") {
    // plant an exact payload duplicate of media 1 under a new id
    val dup = media.toDF().filter($"media_id" === 1)
      .withColumn("media_id", lit(900001L)).as[Media.MediaRow](media.encoder)
    val corpus = media.union(dup)
    val top = Media.nearestMedia(corpus, queryId = 1L, k = 3).collect()
    assert(top.head.getLong(0) == 900001L, top.mkString(";"))
    assert(top.head.getDouble(1) == 1.0)
  }

  test("video payloads are real MJPEG AVIs; frames round-trip byte-for-byte") {
    val vids = media.filter($"kind" === "video").collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      MediaCodec.decode(r.payload) match {
        case MediaCodec.VideoMjpeg(mpf, frames) =>
          assert(mpf == 40000L, "25 fps container clock")
          assert(frames.length == (r.duration_ms / 40).max(2L).min(8L).toInt)
          // every frame is a genuine JPEG that ImageIO decodes at the
          // row's declared dimensions
          frames.foreach { j =>
            val raster = MediaCodec.frameRaster(j)
            assert(raster.exists(x => x.width == r.width && x.height == r.height),
              s"frame must decode at ${r.width}x${r.height} for id=${r.media_id}")
          }
        case other => fail(s"expected VideoMjpeg for id=${r.media_id}, got $other")
      }
    }
    // container round-trip: rebuild an AVI from the extracted frames and
    // demand the re-parse returns them frame-for-frame, byte-exact
    val q = vids.minBy(_.media_id)
    val MediaCodec.VideoMjpeg(mpf, frames) = MediaCodec.decode(q.payload): @unchecked
    val rebuilt = MediaCodec.aviBytes(frames.toSeq, q.width, q.height, mpf)
    val MediaCodec.VideoMjpeg(mpf2, frames2) = MediaCodec.decode(rebuilt): @unchecked
    assert(mpf2 == mpf && frames2.length == frames.length)
    assert(frames.zip(frames2).forall { case (a, b) => java.util.Arrays.equals(a, b) },
      "AVI write -> parse must be frame-for-frame byte-exact")
  }

  test("malformed AVI containers quarantine as Opaque instead of hanging") {
    // truncated header
    assert(MediaCodec.decode("RIFF    AVI ".getBytes("US-ASCII"))
      .isInstanceOf[MediaCodec.Opaque])
    // a chunk whose u32 size wraps negative (0xFFFFFFFF) must not spin
    // the walker backward — abort to Opaque
    val evil = "RIFF0000AVI LIST".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1) ++ "movi0000".getBytes("US-ASCII")
    assert(MediaCodec.decode(evil).isInstanceOf[MediaCodec.Opaque])
    // valid container, frame bytes that are not JPEG: parses, but the
    // non-decodable frame yields no raster (embed skips it)
    val junk = MediaCodec.aviBytes(Seq(Array[Byte](1, 2, 3, 4)), 2, 2)
    MediaCodec.decode(junk) match {
      case MediaCodec.VideoMjpeg(_, frames) =>
        assert(frames.length == 1 && MediaCodec.frameRaster(frames(0)).isEmpty)
      case other => fail(s"container itself is well-formed: $other")
    }
  }

  test("frameAt on video is a real time-indexed frame seek, not a byte slice") {
    val r = media.filter($"kind" === "video").orderBy($"media_id").head()
    val MediaCodec.VideoMjpeg(mpf, frames) = MediaCodec.decode(r.payload): @unchecked
    assert(frames.length >= 2)
    // frame index = offset·1000 / µs-per-frame: 0 ms → frame 0,
    // 40 ms → frame 1, far past the end clamps to the last frame
    assert(java.util.Arrays.equals(MediaCodec.frameAt(r.payload, 0L), frames(0)))
    assert(java.util.Arrays.equals(MediaCodec.frameAt(r.payload, mpf / 1000), frames(1)))
    assert(java.util.Arrays.equals(MediaCodec.frameAt(r.payload, 3600000L), frames.last))
    // the clip has motion: first and last frames are distinct images
    assert(!java.util.Arrays.equals(frames(0), frames.last))
  }

  test("video embed is the mean of its frame embeds") {
    val r = media.filter($"kind" === "video").orderBy($"media_id").head()
    val dec = MediaCodec.decode(r.payload)
    val MediaCodec.VideoMjpeg(_, frames) = dec: @unchecked
    val got = MediaCodec.embed(dec, 8)
    val frameEmbeds = frames.flatMap(MediaCodec.frameRaster(_)).map(MediaCodec.embed(_, 8))
    val want = (0 until 8).map(d => frameEmbeds.map(_(d)).sum / frameEmbeds.length)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-5f) }
    assert(got.exists(_ > 0f), "video features must carry signal")
  }

  test("resize on video rebuilds the AVI at the new dimensions, clock intact") {
    val r = media.filter($"kind" === "video").orderBy($"media_id").head()
    val out = MediaCodec.resize(MediaCodec.decode(r.payload), 32, 24)
    val MediaCodec.VideoMjpeg(mpf, frames) = MediaCodec.decode(out): @unchecked
    assert(mpf == 40000L)
    assert(frames.nonEmpty)
    assert(frames.forall(j => MediaCodec.frameRaster(j)
      .exists(x => x.width == 32 && x.height == 24)))
  }

  test("nearestMediaFrom answers from a persisted feature frame, codec not re-run") {
    val q = media.filter($"kind" === "audio").orderBy($"media_id").head()
    val feats = Media.decodeFeatures(media, dim = 8).toDF()
      .select($"media_id", $"feature".cast("array<double>").as("feature"))
      .cache()
    feats.count() // decode ONCE into the cache
    val top = Media.nearestMediaFrom(
      feats.filter($"media_id" =!= q.media_id),
      feats.filter($"media_id" === q.media_id), k = 3).collect()
    // same answer as the decode-per-call form
    val direct = Media.nearestMedia(media, q.media_id, k = 3).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      direct.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // and the lookup plan reads the cached frame, not the media source
    val plan = Media.nearestMediaFrom(
      feats.filter($"media_id" =!= q.media_id),
      feats.filter($"media_id" === q.media_id), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    feats.unpersist()
  }

  test("frameSample emits n offsets per av row, within duration") {
    val fs = Media.frameSample(media, nFrames = 4)
    val avRows = media.filter($"kind".isin("video", "audio")).count()
    assert(fs.count() == avRows * 4)
    assert(fs.toDF().filter($"offset_ms" < 0 || $"offset_ms" > $"media_id" * 0 + Long.MaxValue).count() == 0)
    val bad = fs.toDF().join(media.toDF().select($"media_id", $"duration_ms"), "media_id")
      .filter($"offset_ms" > $"duration_ms").count()
    assert(bad == 0)
  }

  test("dHash64 is invariant to a linear brightness/contrast shift") {
    val png = MediaCodec.synthPng(7L, 120, 90)
    val raster = MediaCodec.decode(png).asInstanceOf[MediaCodec.ImageRaster]
    // px' = px/2 + 64: strictly monotone, so every gradient sign survives
    val shifted = raster.copy(pixels =
      raster.pixels.map(b => ((b & 0xff) / 2 + 64).toByte))
    val h0 = MediaCodec.dHash64(raster).get
    val h1 = MediaCodec.dHash64(shifted).get
    assert(h0 == h1, s"brightness shift flipped bits: ${java.lang.Long.bitCount(h0 ^ h1)}")
  }

  test("dHash64 survives resize within a few bits; distinct textures differ widely") {
    val a = MediaCodec.decode(MediaCodec.synthPng(1L, 100, 80))
    val aBig = MediaCodec.decode(
      MediaCodec.resize(a, 200, 160))
    val near = java.lang.Long.bitCount(
      MediaCodec.dHash64(a).get ^ MediaCodec.dHash64(aBig).get)
    assert(near <= 8, s"2x upscale moved the dHash by $near bits")
    val b = MediaCodec.decode(MediaCodec.synthPng(2L, 100, 80))
    val far = java.lang.Long.bitCount(
      MediaCodec.dHash64(a).get ^ MediaCodec.dHash64(b).get)
    assert(far > 8, s"different gratings should differ widely, got $far bits")
    // non-images never hash
    assert(MediaCodec.dHash64(MediaCodec.decode(MediaCodec.synthWav(3L, 500))).isEmpty)
  }

  test("phashNearDupPairs finds planted image copies at hamming 0, banding exact") {
    val imgs = media.filter($"kind" === "image")
    val planted = imgs.limit(3).toDF()
      .withColumn("media_id", $"media_id" + 500000L)
      .as[Media.MediaRow](media.encoder)
    val corpus = media.union(planted)
    val plantedIds = planted.collect().map(_.media_id).toSet
    val pairs = Media.phashNearDupPairs(corpus, radius = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted copy pairs with its original at hamming 0
    val zeroPairs = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    plantedIds.foreach { pid =>
      assert(zeroPairs.contains((pid - 500000L, pid)),
        s"copy $pid must pair with its original: ${pairs.mkString(";")}")
    }
    // pair orientation and radius contract
    assert(pairs.forall(p => p._1 < p._2 && p._3 <= 3))
    // only image rows enter the phash path
    assert(Media.withPerceptualHash(corpus).count() == imgs.count() + 3)
  }

  test("videoNearDupPairs: container rewrite dups, partial frame overlap, disjoint content") {
    // A: an 8-frame synthetic video. A2: the SAME frames in a rebuilt
    // container (byte-different payload, perceptually identical). B:
    // A's frames with the tail replaced by other content (partial
    // overlap). C: fully different content.
    val framesA = MediaCodec.decode(MediaCodec.synthAvi(3L, 64, 48, 320L))
      .asInstanceOf[MediaCodec.VideoMjpeg].frames.toSeq
    val framesC = MediaCodec.decode(MediaCodec.synthAvi(9L, 64, 48, 320L))
      .asInstanceOf[MediaCodec.VideoMjpeg].frames.toSeq
    val pA = MediaCodec.aviBytes(framesA, 64, 48)
    val pA2 = MediaCodec.aviBytes(framesA, 64, 48) // rebuild = rewrite
    val pB = MediaCodec.aviBytes(framesA.take(6) ++ framesC.take(2), 64, 48)
    val pC = MediaCodec.aviBytes(framesC, 64, 48)
    val vids = Seq(
      Media.MediaRow(1L, "video", pA, 64, 48, 320L),
      Media.MediaRow(2L, "video", pA2, 64, 48, 320L),
      Media.MediaRow(3L, "video", pB, 64, 48, 320L),
      Media.MediaRow(4L, "video", pC, 64, 48, 320L)).toDS()
    // sample positions 0, 1/3, 2/3, 1 of 320ms -> frames 0, 2, 5, 7
    val got = Media.videoNearDupPairs(vids, nFrames = 4, minShared = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 4L, s"container rewrite must share all positions: $got")
    // B shares frames 0, 2, 5 (positions over the first 6 frames) but
    // not 7 -> exactly 3 shared, admitted at minShared = 3
    assert(got((1L, 3L)) == 3L && got((2L, 3L)) == 3L, got.toString)
    assert(!got.contains((1L, 4L)) && !got.contains((2L, 4L)) && !got.contains((3L, 4L)),
      s"disjoint content must not pair: $got")
    // and the threshold is a real cut: minShared = 4 drops the partials
    val strict = Media.videoNearDupPairs(vids, nFrames = 4, minShared = 4)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(strict == Set((1L, 2L)), strict.toString)
  }
}
