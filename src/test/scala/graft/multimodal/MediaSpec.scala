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
      val d = MediaCodec.decode(row.payload)
      !(d.isImage && d.width == 16 && d.height == 16)
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
    val d = MediaCodec.decode(out.toByteArray)
    assert(d.isImage && d.width == 3 && d.height == 2)
    assert(d.pixels.map(_ & 0xff).toSeq == vals.toSeq)
    // and the synthesized corpus's image rows decode at their declared dims
    val imgs = media.filter($"kind" === "image").collect()
    assert(imgs.nonEmpty)
    assert(imgs.forall { r =>
      val dd = MediaCodec.decode(r.payload)
      dd.isImage && dd.width == r.width && dd.height == r.height
    })
  }

  test("nearestMedia ranks a visually-identical image first despite distinct PNG bytes") {
    import java.awt.image.{BufferedImage, DataBufferByte}
    import javax.imageio.ImageIO
    val q = media.filter($"kind" === "image").orderBy($"media_id").head()
    val d = MediaCodec.decode(q.payload)
    // twin: same image with one pixel toggled by 1 luma step — visually
    // identical, but the PNG byte stream differs from the original
    val bi = new BufferedImage(d.width, d.height, BufferedImage.TYPE_BYTE_GRAY)
    val px = bi.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    System.arraycopy(d.pixels, 0, px, 0, d.pixels.length)
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

  test("frameSample emits n offsets per av row, within duration") {
    val fs = Media.frameSample(media, nFrames = 4)
    val avRows = media.filter($"kind".isin("video", "audio")).count()
    assert(fs.count() == avRows * 4)
    assert(fs.toDF().filter($"offset_ms" < 0 || $"offset_ms" > $"media_id" * 0 + Long.MaxValue).count() == 0)
    val bad = fs.toDF().join(media.toDF().select($"media_id", $"duration_ms"), "media_id")
      .filter($"offset_ms" > $"duration_ms").count()
    assert(bad == 0)
  }
}
