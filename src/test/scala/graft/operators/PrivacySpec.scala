package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymize: small quasi groups flagged, audit trail keeps every row") {
    val rows = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "en", "book"),                     // singleton -> suppressed
      (5L, "de", "web"), (6L, "de", "web"))   // pair at k=3 -> suppressed
      .toDF("id", "lang", "src")
    val got = Privacy.kAnonymize(rows, Seq(col("lang"), col("src")), k = 3L)
      .select("id", "group_size", "suppressed")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 6, "every row must come back with its verdict")
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) == ((3L, false)), got.toString))
    assert(got(4L) == ((1L, true)), got.toString)
    Seq(5L, 6L).foreach(i => assert(got(i) == ((2L, true)), got.toString))
  }

  test("lDiversity: the homogeneity attack case — k-anonymous but constant-sensitive") {
    val rows = Seq(
      // group (en, web): 3 rows, all the same diagnosis -> NOT diverse
      (1L, "en", "web", "flu"), (2L, "en", "web", "flu"), (3L, "en", "web", "flu"),
      // group (de, web): 3 rows, 2 distinct -> diverse at l=2, not at l=3
      (4L, "de", "web", "flu"), (5L, "de", "web", "cold"), (6L, "de", "web", "cold"))
      .toDF("id", "lang", "src", "diag")
    def audit(l: Long) =
      Privacy.lDiversity(rows, Seq(col("lang"), col("src")), col("diag"), l)
        .select("q0", "group_size", "n_sensitive", "diverse")
        .as[(String, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val l2 = audit(2L)
    assert(l2("en") == ((3L, 1L, false)),
      s"k-anonymous constant-sensitive group must fail diversity: $l2")
    assert(l2("de") == ((3L, 2L, true)), l2.toString)
    assert(audit(3L)("de")._3 == false, "l is a real threshold")
  }

  test("generalizeUntilK: minimal qualifying width, floor-bucket release, suppression") {
    // values 0..9 (width-10 bucket 0 holds 10) plus a far outlier at
    // 1000 that no level of a 4-level base-5 ladder can crowd
    val rows = ((0L until 10L).map(v => (v, v)) :+ ((99L, 1000L)))
      .toDF("id", "v")
    val got = Privacy.generalizeUntilK(rows, col("id"), col("v"),
        baseWidth = 5L, maxLevels = 2, k = 8L)
      .select("id", "level", "bucket", "group_size")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // level 0 buckets (w=5): {0..4}, {5..9} -> 5 rows each, under k=8;
    // level 1 (w=10): {0..9} -> 10 rows >= 8. Minimal level is 1.
    (0L until 10L).foreach { v =>
      assert(got(v) == ((1L, Some(0L), Some(10L))),
        s"v=$v must generalize to the level-1 bucket: ${got(v)}")
    }
    // the outlier's bucket holds 1 row at every level -> suppressed
    assert(got(99L) == ((-1L, None, None)), got.toString)
    // minimality cross-check: with k=5 level 0 already qualifies and the
    // released bucket is the FINER floor
    val fine = Privacy.generalizeUntilK(rows, col("id"), col("v"),
        baseWidth = 5L, maxLevels = 2, k = 5L)
      .select("id", "level", "bucket")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fine(3L) == ((0L, Some(0L))) && fine(7L) == ((0L, Some(5L))), fine.toString)
  }
}
