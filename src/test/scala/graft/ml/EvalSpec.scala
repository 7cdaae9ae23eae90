package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Option[Long]) =
    Eval.aucExact(rows.toDF("score", "label"), col("score"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).head

  test("aucExact: perfect separation is 10^6, reversal is 0") {
    assert(auc(Seq((10L, true), (11L, true), (1L, false), (2L, false)))
      === ((2L, 2L, 8L, Some(1000000L))))
    assert(auc(Seq((1L, true), (2L, true), (10L, false), (11L, false)))
      === ((2L, 2L, 0L, Some(0L))))
  }

  test("aucExact: mid-rank ties match the hand calculation") {
    // values asc: 1(pos), 1(neg), 2(neg), 3(pos); mid-rank of the tied
    // 1s = 1.5; U = (1.5 + 4) − 2·3/2 = 2.5 → AUC = 2.5/4 = 0.625
    assert(auc(Seq((3L, true), (1L, true), (2L, false), (1L, false)))
      === ((2L, 2L, 5L, Some(625000L))))
  }

  test("aucExact: one-class inputs release NULL, not a fake number") {
    val all = auc(Seq((1L, true), (2L, true)))
    assert(all._1 == 2L && all._2 == 0L && all._4.isEmpty, all.toString)
    val none = auc(Seq((1L, false), (2L, false)))
    assert(none._1 == 0L && none._4.isEmpty, none.toString)
  }

  test("aucExact: all-tied scores give exactly 1/2 (pure chance)") {
    assert(auc(Seq((5L, true), (5L, true), (5L, false), (5L, false)))._4
      === Some(500000L))
  }
}
