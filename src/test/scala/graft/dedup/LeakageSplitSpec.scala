package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the claim `leakageSafeSplit`'s scaladoc makes: the split built
  * on the COLLAPSED near-dup graph equals, row for row, the split built
  * on the plain [[Dedup.nearDuplicates]] graph — on a mixed
  * exact+near corpus (collapse machinery engaged) AND on a dup-free
  * corpus (the presence gate short-circuits to the plain path). The
  * split consumes only component labels, and the collapsed graph is
  * connectivity-equivalent, so assignments cannot differ. */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = MinHashConfig.generated(64, 16, portable = false)

  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearText = ((1 to 39).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val otherText = (1 to 40).map(i => s"other$i").mkString(" ")
  private val uniqueText = (1 to 40).map(i => s"solo$i").mkString(" ")

  /** exact family A {1,2,3} + its near-dup 4, exact family B {5,6},
    * singleton 7 — both code paths of the collapse engaged. */
  private val mixed = Seq(
    1L -> baseText, 2L -> baseText, 3L -> baseText,
    4L -> nearText,
    5L -> otherText, 6L -> otherText,
    7L -> uniqueText
  ).toDF("doc_id", "text")

  /** The plain-path split: [[Dedup.nearDuplicates]] pairs → components
    * → the same id-mod assignment rule leakageSafeSplit applies. */
  private def plainSplit(corpus: DataFrame, nBuckets: Int, evalBuckets: Int): DataFrame = {
    val pairs = Dedup.nearDuplicates(corpus, col("doc_id"), col("text"), 0.8, cfg)
    val cc = Dedup.connectedComponents(pairs, col("d1"), col("d2"))
    corpus.select(col("doc_id"))
      .join(cc, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("canon"), col("doc_id")).as("cluster"))
      .withColumn("split",
        when(pmod(col("cluster"), lit(nBuckets)) < evalBuckets, lit("eval"))
          .otherwise(lit("train")))
  }

  private def asRows(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("mixed exact+near corpus: collapsed-path split == plain-path split row-for-row") {
    // nBuckets=2, evalBuckets=1 so both sides are non-empty on 7 docs
    val got = asRows(Dedup.leakageSafeSplit(mixed, col("doc_id"), col("text"),
      0.8, cfg, nBuckets = 2, evalBuckets = 1))
    val want = asRows(plainSplit(mixed, 2, 1))
    assert(got === want)
    // and the clustering underneath is the expected one: {1,2,3,4} {5,6} {7}
    val clusters = got.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(clusters(1L) === Set(1L, 2L, 3L, 4L) && clusters(5L) === Set(5L, 6L)
      && clusters(7L) === Set(7L))
    // whole clusters land on one side
    assert(got.groupBy(_._2).forall(_._2.map(_._3).size >= 1))
    assert(got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).values
      .forall(_.size === 1), "a cluster must not straddle the split")
  }

  test("dup-free corpus: the presence gate engages and the split still matches") {
    val distinctCorpus = Seq(1L -> baseText, 2L -> nearText, 3L -> uniqueText,
      4L -> otherText).toDF("doc_id", "text")
    val got = asRows(Dedup.leakageSafeSplit(distinctCorpus, col("doc_id"), col("text"),
      0.8, cfg, nBuckets = 2, evalBuckets = 1))
    val want = asRows(plainSplit(distinctCorpus, 2, 1))
    assert(got === want)
    // the near pair (1,2) clusters together; 3 and 4 are singletons
    val clusters = got.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(clusters(1L) === Set(1L, 2L))
    assert(clusters(3L) === Set(3L) && clusters(4L) === Set(4L))
  }
}
