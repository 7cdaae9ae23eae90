package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Media-side posting-list cap AT BIND (the [[graft.dedup.CapBandsSpec]]
  * discipline for the phash/audio/video banded joins): each test plants
  * a hot bucket — the solid-thumbnail dHash, the silent-clip signature,
  * the black intro frame — with more postings than `maxPostings`, so
  * the drop semantics execute: pairs colliding only in the hot bucket
  * vanish, pairs with a cool collision survive, and the audit flags
  * exactly the hot bucket. All planted cases run through the
  * `FromHashes` production shapes (hashes persisted once, re-banded per
  * radius); the last test drives the real PNG codec end-to-end. */
class MediaCapSpec extends SparkSpec {
  import spark.implicits._

  /** Planted hash family generator: 2 cool true-dups (X, X^1) plus a
    * hot family sharing band 0 = V whose first two members are within
    * the radius but share ONLY band 0 (one differing bit in each other
    * band), and fillers carrying a DISTINCT weight-2 value in every
    * cool band (pairwise hamming ≥ 2·(nBands−1) > radius, no
    * cool-bucket sharing anywhere — `checkFamily` asserts it all). */
  private def plantFamily(bits: Int, nBands: Int, hotV: Long, x: Long): Seq[(Long, Long)] = {
    val width = bits / nBands
    val uBands = nBands - 1
    val u100 = (0x7FL << ((uBands - 1) * width)) | 1L
    val onePerOtherBand = (1 until nBands).map(b => 1L << (b * width)).reduce(_ | _)
    val fillers = Seq(0x3L, 0x5L, 0x6L, 0x9L, 0xAL, 0xCL)
      .map(c => (0 until uBands).map(b => c << (b * width)).reduce(_ | _))
    Seq(1L -> x, 2L -> (x ^ 1L),
      100L -> (hotV | (u100 << width)),
      101L -> ((hotV | (u100 << width)) ^ onePerOtherBand)) ++
      fillers.zipWithIndex.map { case (u, i) => (102L + i) -> (hotV | (u << width)) }
  }

  private def bandsOf(sig: Long, bits: Int, nBands: Int): Seq[(Int, Long)] = {
    val width = bits / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    (0 until nBands).map(b => b -> ((sig >> (b * width)) & mask))
  }

  /** Assert the planted family really has the claimed shape: exactly two
    * in-radius pairs, (100,101) sharing only the hot bucket, and the hot
    * bucket the only one past the cap. */
  private def checkFamily(fam: Seq[(Long, Long)], bits: Int, nBands: Int,
                          radius: Int, hotV: Long, cap: Int): Unit = {
    val sigs = fam.toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) === 1)
    assert(java.lang.Long.bitCount(sigs(100L) ^ sigs(101L)) === nBands - 1)
    assert(nBands - 1 <= radius)
    assert(bandsOf(sigs(100L), bits, nBands).intersect(bandsOf(sigs(101L), bits, nBands))
      === Seq(0 -> hotV))
    val ids = sigs.keys.toSeq.sorted
    for (a <- ids; b <- ids if a < b && (a, b) != ((1L, 2L)) && (a, b) != ((100L, 101L)))
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) > radius, s"($a,$b)")
    val census = fam.flatMap { case (_, s) => bandsOf(s, bits, nBands) }
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(census((0, hotV)) === fam.count(_._1 >= 100L))
    assert(census.filter(_._2 > cap).keySet === Set(0 -> hotV))
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def auditMap(df: DataFrame): Map[(Int, Long), (Long, Boolean)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap

  // -------------------------------------------------------------- phash

  // 64 bits, radius 3 -> 4 bands of 16
  private val phashFam = plantFamily(64, 4, 0x1ABCL, 0x0FEDCBA987654321L)

  test("phash cap at bind: solid-thumbnail bucket drops its pairs, cool pairs survive") {
    checkFamily(phashFam, 64, 4, radius = 3, hotV = 0x1ABCL, cap = 5)
    val p = phashFam.toDF("media_id", "phash")
    assert(pairSet(Media.phashNearDupPairsFromHashes(p, radius = 3, maxPostings = 5))
      === Set((1L, 2L, 1L)))
    assert(pairSet(Media.phashNearDupPairsFromHashes(p, radius = 3, maxPostings = 1000))
      === Set((1L, 2L, 1L), (100L, 101L, 3L)))
    val audit = auditMap(Media.phashBandAuditFromHashes(p, radius = 3, maxPostings = 5))
    assert(audit.filter(_._2._2).keySet === Set(0 -> 0x1ABCL))
    assert(audit((0, 0x1ABCL)) === ((8L, true)))
  }

  // -------------------------------------------------------------- audio

  // 60 bits, radius 5 -> 6 bands of 10
  private val audioFam = plantFamily(60, 6, 0x2A5L,
    0x0ABCDEF987654321L & ((1L << 60) - 1))

  test("audio cap at bind: silent-clip bucket drops its pairs, cool pairs survive") {
    checkFamily(audioFam, 60, 6, radius = 5, hotV = 0x2A5L, cap = 5)
    val p = audioFam.toDF("media_id", "ahash")
    assert(pairSet(Media.audioNearDupPairsFromHashes(p, radius = 5, maxPostings = 5))
      === Set((1L, 2L, 1L)))
    assert(pairSet(Media.audioNearDupPairsFromHashes(p, radius = 5, maxPostings = 1000))
      === Set((1L, 2L, 1L), (100L, 101L, 5L)))
    val audit = auditMap(Media.audioBandAuditFromHashes(p, radius = 5, maxPostings = 5))
    assert(audit.filter(_._2._2).keySet === Set(0 -> 0x2A5L))
  }

  // -------------------------------------------------------------- video

  test("video cap at bind: black intro frame neither pairs nor counts toward minShared") {
    // frame-hash corpus: videos 1/2 share 3 cool positions (a real dup);
    // videos 200..209 all carry the black frame B at position 0; 200/201
    // additionally share only 2 cool positions — under minShared=3 they
    // qualify ONLY if the black frame counts, so the cap must reject them
    val B = 0xB1ACL
    val f = (
      Seq((1L, 1, 0x11L), (1L, 2, 0x12L), (1L, 3, 0x13L), (1L, 0, 0x10L),
        (2L, 1, 0x11L), (2L, 2, 0x12L), (2L, 3, 0x13L), (2L, 0, 0x20L)) ++
        (200L to 209L).map(id => (id, 0, B)) ++
        Seq((200L, 1, 0x31L), (200L, 2, 0x32L), (200L, 3, 0x33L),
          (201L, 1, 0x31L), (201L, 2, 0x32L), (201L, 3, 0x43L))
      ).toDF("media_id", "frame_idx", "fhash")
    def pairs(cap: Long) =
      Media.videoNearDupPairsFromHashes(f, minShared = 3, maxPostings = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs(5) === Set((1L, 2L, 3L)),
      "(200,201) has 2 cool agreements + the capped black frame: not a pair")
    assert(pairs(1000) === Set((1L, 2L, 3L), (200L, 201L, 3L)))
    val audit = Media.videoFrameBandAuditFromHashes(f, maxPostings = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(audit.filter(_._2._2).keySet === Set(0 -> B))
    assert(audit((0, B)) === ((10L, true)))
    // the cool shared positions are audited uncapped
    assert(audit((1, 0x11L)) === ((2L, false)))
  }

  // -------------------------------------- real codec end-to-end (images)

  test("real-codec hot band: a flood of identical thumbnails caps away, distinct dup survives") {
    // 8 byte-identical PNGs (the solid-thumbnail scenario: one dHash in
    // every band bucket) + one genuinely duplicated distinct image
    val rows = ((1L to 8L).map(id =>
      Media.MediaRow(id, "image", MediaCodec.synthPng(7L, 64, 64), 64, 64, 0L)) ++
      Seq(20L, 21L).map(id =>
        Media.MediaRow(id, "image", MediaCodec.synthPng(13L, 64, 64), 64, 64, 0L)))
      .toDS()
    val capped = pairSet(Media.phashNearDupPairs(rows, radius = 3, maxPostings = 5))
    assert(capped === Set((20L, 21L, 0L)))
    val uncapped = pairSet(Media.phashNearDupPairs(rows, radius = 3, maxPostings = 1000))
    assert(uncapped.size === 28 + 1)
    // audit (FromHashes form — one codec pass for pairs + audit): the
    // flooded image's 4 buckets are the flagged ones, 8 postings each
    val hashes = Media.withPerceptualHash(rows)
    val flagged = auditMap(Media.phashBandAuditFromHashes(hashes, radius = 3,
      maxPostings = 5)).filter(_._2._2)
    assert(flagged.size === 4 && flagged.keys.map(_._1).toSet === Set(0, 1, 2, 3))
    assert(flagged.values.forall(_._1 === 8L))
  }
}
