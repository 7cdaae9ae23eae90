package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED — the container ships no image/audio libraries — behind
  * [[MediaCodec]], with a deterministic fake so schemas, partitioning and
  * batch shapes are real and testable. Swap the codec object for a JNI/
  * library-backed one and nothing else changes.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  case class FrameSample(media_id: Long, frame_idx: Int, offset_ms: Long,
                         frame_bytes: Array[Byte])

  /** Deterministic synthetic media corpus derived from the documents
    * table: payload = utf8 text bytes posing as an encoded blob. */
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
  }

  /** Per-partition batched decode + feature extraction. The iterator shape
    * (one pass, constant memory per batch) is what a Pandas-UDF/Arrow
    * pipeline would see; the codec call is the stubbed seam. */
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
    * (width/height updated alongside the payload). Batched per partition
    * like [[decodeFeatures]]; the pixel work is the stubbed codec seam. */
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

/** The codec seam. Every method is a deterministic stand-in for a real
  * decoder (no image/audio libs in this container — see module doc). */
object MediaCodec {
  /** STUB: a real impl would return decoded samples/pixels. */
  def decode(payload: Array[Byte]): Array[Byte] = payload

  def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xff)) * 1099511628211L)

  /** STUB feature embedding: byte histogram folded to `dim` floats. */
  def embed(decoded: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < decoded.length) {
      acc(i % dim) += (decoded(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** STUB resize: a real impl would rescale pixels; the stand-in
    * deterministically resamples the byte stream to w·h length so output
    * size tracks the requested dimensions like a real bitmap would. */
  def resize(decoded: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(w * h, 1)
    val out = new Array[Byte](n)
    if (decoded.nonEmpty) {
      var i = 0
      while (i < n) { out(i) = decoded((i.toLong * decoded.length / n).toInt); i += 1 }
    }
    out
  }

  /** STUB: a real impl would seek the container to `offsetMs`. */
  def frameAt(payload: Array[Byte], offsetMs: Long): Array[Byte] = {
    val start = ((offsetMs % math.max(payload.length, 1)).toInt).min(math.max(payload.length - 8, 0))
    payload.slice(start, math.min(start + 8, payload.length))
  }
}
