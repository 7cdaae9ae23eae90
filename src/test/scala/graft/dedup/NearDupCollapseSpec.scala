package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDupCollapseSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = MinHashConfig.generated(64, 16, portable = false)

  /** 40 distinct tokens → 38 shingles; variant swaps the last token, so
    * J = 37/39 ≈ 0.949 ≥ 0.8 against every family-A member. */
  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearText = ((1 to 39).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val otherText = (1 to 40).map(i => s"other$i").mkString(" ")
  private val uniqueText = (1 to 40).map(i => s"solo$i").mkString(" ")

  private def corpus = Seq(
    1L -> baseText, 2L -> baseText, 3L -> baseText, // exact family A
    4L -> nearText,                                 // near-dup of A
    5L -> otherText, 6L -> otherText,               // exact family B
    7L -> uniqueText                                // singleton
  ).toDF("doc_id", "text")

  private def canonMap(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.connectedComponents(pairs, col("d1"), col("d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("collapsed pairs are connectivity-equivalent to the full operator") {
    val full = Dedup.nearDuplicates(corpus, col("doc_id"), col("text"), 0.8, cfg)
    val coll = Dedup.nearDuplicatesCollapsed(corpus, col("doc_id"), col("text"), 0.8, cfg)
    val (cf, cc) = (canonMap(full), canonMap(coll))
    assert(cf === cc)
    // and the clustering is the expected one: {1,2,3,4} and {5,6}
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("star pairs carry J=1.0; rep-level near pairs carry the verified J") {
    val coll = Dedup.nearDuplicatesCollapsed(corpus, col("doc_id"), col("text"), 0.8, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(coll((1L, 2L)) === 1.0 && coll((1L, 3L)) === 1.0 && coll((5L, 6L)) === 1.0)
    // one rep-level near pair (1,4), with the exact-Jaccard value the
    // full operator computes for the same text pair
    val full = Dedup.nearDuplicates(corpus, col("doc_id"), col("text"), 0.8, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(coll((1L, 4L)) === full((1L, 4L)))
    // clique pairs (2,3), (2,4), (3,4) are NOT re-emitted — the star +
    // rep contract
    assert(!coll.contains((2L, 3L)) && !coll.contains((2L, 4L)))
    assert(coll.size === 4)
  }

  test("downstream election sees identical clusters through either operator") {
    val q = corpus.select(col("doc_id"), length(col("text")).as("q"))
    def elect(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.bestQualityCanon(pairs, col("d1"), col("d2"), q,
        col("doc_id"), col("q"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = elect(Dedup.nearDuplicates(corpus, col("doc_id"), col("text"), 0.8, cfg))
    val coll = elect(Dedup.nearDuplicatesCollapsed(corpus, col("doc_id"), col("text"), 0.8, cfg))
    assert(full === coll)
  }

  test("a corpus with no exact dups degrades to the plain operator's pairs") {
    val distinctCorpus = Seq(1L -> baseText, 2L -> nearText, 3L -> uniqueText)
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
    val full = pairSet(Dedup.nearDuplicates(
      distinctCorpus, col("doc_id"), col("text"), 0.8, cfg))
    val coll = pairSet(Dedup.nearDuplicatesCollapsed(
      distinctCorpus, col("doc_id"), col("text"), 0.8, cfg))
    assert(coll === full)
    assert(full.nonEmpty)
  }
}
