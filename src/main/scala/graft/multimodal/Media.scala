package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The IMAGE path is real: payloads are genuine PNGs, decoded with the
  * JDK's `javax.imageio.ImageIO` (no external dependency), resized with
  * `java.awt.image.BufferedImage` scaling, and embedded as a mean-pooled
  * grayscale pixel grid. Audio/video codec work (resampling, frame
  * extraction) remains STUBBED — the container genuinely ships no
  * audio/video libraries — behind [[MediaCodec]], with a deterministic
  * fake so schemas, partitioning and batch shapes are real and testable.
  * Swap the a/v half of the codec object for a library-backed one and
  * nothing else changes.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  case class FrameSample(media_id: Long, frame_idx: Int, offset_ms: Long,
                         frame_bytes: Array[Byte])

  /** Deterministic synthetic media corpus derived from the documents
    * table. Image rows carry a REAL PNG (seeded deterministic texture at
    * the row's declared width×height); audio/video rows carry utf8 text
    * bytes posing as an encoded blob, matching the stubbed a/v codec. */
  def synthesize(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
      (col("n_chars") * 40).as("duration_ms")).as[MediaRow]
      .map { r =>
        if (r.kind == "image")
          r.copy(payload = MediaCodec.synthPng(r.media_id, r.width, r.height))
        else r
      }
  }

  /** Per-partition batched decode + feature extraction. The iterator shape
    * (one pass, constant memory per batch) is what a Pandas-UDF/Arrow
    * pipeline would see; image rows run the real ImageIO decode, a/v rows
    * the stubbed seam. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded = MediaCodec.decode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          MediaCodec.checksum(r.payload), MediaCodec.embed(decoded, dim))
      }
    }
  }

  /** Decode → resize → re-encode, keeping the typed-metadata invariant
    * (width/height updated alongside the payload). Image payloads come
    * back as a real re-encoded PNG at the new dimensions. Batched per
    * partition like [[decodeFeatures]]. */
  def resized(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind == "image")
          r.copy(payload = MediaCodec.resize(MediaCodec.decode(r.payload), w, h),
            width = w, height = h)
        else r
      }
    }
  }

  /** Multimodal × similarity composition: embed every payload via the
    * codec seam, then brute-force cosine top-k against one query media id
    * — the same broadcast + TakeOrdered shape as
    * [[graft.similarity.Similarity.knnBrute]], over decoded features
    * instead of pre-computed embeddings. */
  def nearestMedia(media: Dataset[MediaRow], queryId: Long, k: Int,
                   dim: Int = 8): DataFrame = {
    // filter BEFORE decode on both sides: the broadcast (query) branch
    // would otherwise re-run the whole-corpus codec pass to extract one row
    def feats(rows: Dataset[MediaRow]) = decodeFeatures(rows, dim)
      .select(col("media_id"), col("feature").cast("array<double>").as("feature"))
    graft.similarity.Similarity.knnBrute(
      feats(media.filter(col("media_id") =!= queryId)), col("media_id"), col("feature"),
      feats(media.filter(col("media_id") === queryId)), col("feature"), k)
  }

  /** Evenly spaced frame-sample offsets for video/audio payloads; the
    * frame bytes come from the stubbed codec. */
  def frameSample(media: Dataset[MediaRow], nFrames: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind").isin("video", "audio")).flatMap { r =>
      (0 until nFrames).map { i =>
        val off = if (nFrames == 1) 0L else r.duration_ms * i / (nFrames - 1)
        FrameSample(r.media_id, i, off, MediaCodec.frameAt(r.payload, off))
      }
    }
  }
}

/** The codec seam. Image methods are REAL (JDK `ImageIO` +
  * `BufferedImage` — PNG/JPEG/BMP/GIF decode ships with the JVM); the
  * audio/video methods remain deterministic stand-ins (no a/v libraries
  * in this container — see module doc). Decode sniffs the payload: a
  * recognized image container decodes to grayscale pixels, anything else
  * passes through as opaque bytes for the stubbed a/v path. */
object MediaCodec {
  import java.awt.image.{BufferedImage, DataBufferByte}
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  // executors shouldn't churn temp-dir files per decoded image
  ImageIO.setUseCache(false)

  /** Decoded payload: grayscale pixels (row-major, one byte per pixel)
    * when the payload was a real image; the opaque original bytes (with
    * `isImage = false`, width/height 0) otherwise. */
  case class Raster(width: Int, height: Int, pixels: Array[Byte], isImage: Boolean)

  private val PngSig = Array(0x89, 'P', 'N', 'G').map(_.toByte)

  private def looksLikeImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && (
      payload.startsWith(PngSig) ||                                   // PNG
      (payload(0) == 0xff.toByte && payload(1) == 0xd8.toByte) ||     // JPEG
      (payload(0) == 'B' && payload(1) == 'M') ||                     // BMP
      (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F'))  // GIF

  private def toGray(img: BufferedImage): BufferedImage =
    if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
    else {
      val g = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_BYTE_GRAY)
      val g2 = g.createGraphics()
      g2.drawImage(img, 0, 0, null)
      g2.dispose()
      g
    }

  private def grayImage(r: Raster): BufferedImage = {
    val img = new BufferedImage(r.width, r.height, BufferedImage.TYPE_BYTE_GRAY)
    System.arraycopy(r.pixels, 0,
      img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData, 0, r.pixels.length)
    img
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic seeded grayscale PNG. The texture is LOW-FREQUENCY
    * (seeded sinusoid gratings), not hash noise, on purpose: mean-pooled
    * embeddings of white noise all collapse to ≈0.5 per cell, which would
    * make every synthetic image trivially "similar" — gratings give each
    * seed a distinct pooled signature. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val px = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    val fx = 1 + math.floorMod(seed, 5L).toInt
    val fy = 1 + math.floorMod(seed / 5, 5L).toInt
    val phase = math.floorMod(seed, 360L).toDouble.toRadians
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (math.sin(fx * math.Pi * x / w + phase) *
          math.cos(fy * math.Pi * y / h) * 0.5 + 0.5) * 255.0
        px(y * w + x) = v.round.toInt.max(0).min(255).toByte
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Real decode for image containers (ImageIO → grayscale raster);
    * opaque passthrough for everything else (stubbed a/v path). */
  def decode(payload: Array[Byte]): Raster =
    if (looksLikeImage(payload)) {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) Raster(0, 0, payload, isImage = false)
      else {
        val g = toGray(img)
        val px = g.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
        Raster(g.getWidth, g.getHeight, px, isImage = true)
      }
    } else Raster(0, 0, payload, isImage = false)

  def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xff)) * 1099511628211L)

  /** Feature embedding. Images: mean-pooled pixel grid — the raster is
    * partitioned into `dim` rectangular cells (⌈√dim⌉ columns) and each
    * cell's mean luma (0..1) is one feature. Non-image payloads keep the
    * STUB byte-histogram fold. */
  def embed(decoded: Raster, dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    if (decoded.isImage) {
      val cols = math.ceil(math.sqrt(dim.toDouble)).toInt
      val rows = math.ceil(dim.toDouble / cols).toInt
      val (w, h) = (decoded.width, decoded.height)
      var d = 0
      while (d < dim) {
        val cx = d % cols; val cy = d / cols
        val x0 = cx * w / cols; val x1 = math.max((cx + 1) * w / cols, x0 + 1).min(w)
        val y0 = cy * h / rows; val y1 = math.max((cy + 1) * h / rows, y0 + 1).min(h)
        if (x0 < w && y0 < h) {
          var sum = 0L; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += decoded.pixels(y * w + x) & 0xff; x += 1 }
            y += 1
          }
          acc(d) = sum.toFloat / ((x1 - x0) * (y1 - y0)) / 255.0f
        }
        d += 1
      }
    } else {
      var i = 0
      while (i < decoded.pixels.length) {
        acc(i % dim) += (decoded.pixels(i) & 0xff) / 255.0f
        i += 1
      }
    }
    acc
  }

  /** Resize. Images: bilinear `BufferedImage` rescale, re-encoded as PNG.
    * Non-image payloads keep the STUB byte-stream resample (output size
    * tracks the requested dimensions like a real bitmap would). */
  def resize(decoded: Raster, w: Int, h: Int): Array[Byte] =
    if (decoded.isImage) {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val g2 = dst.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(grayImage(decoded), 0, 0, w, h, null)
      g2.dispose()
      encodePng(dst)
    } else {
      val n = math.max(w * h, 1)
      val out = new Array[Byte](n)
      if (decoded.pixels.nonEmpty) {
        var i = 0
        while (i < n) {
          out(i) = decoded.pixels((i.toLong * decoded.pixels.length / n).toInt)
          i += 1
        }
      }
      out
    }

  /** STUB: a real impl would seek the container to `offsetMs`. */
  def frameAt(payload: Array[Byte], offsetMs: Long): Array[Byte] = {
    val start = ((offsetMs % math.max(payload.length, 1)).toInt).min(math.max(payload.length - 8, 0))
    payload.slice(start, math.min(start + 8, payload.length))
  }
}
