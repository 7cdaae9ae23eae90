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

  test("confusionMetrics: hand-computed 3-class frame, undefined cells NULL") {
    // labels a,a,a,b,b,c; preds a,b,a,b,b,a:
    //   a: tp=2 sup=3 prd=3 → P=R=666666, F1=666666
    //   b: tp=2 sup=2 prd=3 → P=666666 R=10^6,
    //      F1=⌊2·666666·10^6/1666666⌋=799999
    //   c: tp=0 sup=1 prd=0 → P NULL (never predicted), R=0, F1 NULL
    // accuracy=4/6→666666; macro=⌊(666666+799999+0)/3⌋=488888
    val df = Seq(("a", "a"), ("a", "b"), ("a", "a"),
      ("b", "b"), ("b", "b"), ("c", "a")).toDF("label", "pred")
    val got = Eval.confusionMetrics(df, col("label"), col("pred"))
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), opt(5), opt(6), opt(7), r.getLong(8),
          opt(9), r.getLong(10)))
      }.toMap
    assert(got("a") === ((2L, 1L, 1L, 3L, Some(666666L), Some(666666L),
      Some(666666L), 6L, Some(666666L), 488888L)), got("a").toString)
    assert(got("b") === ((2L, 1L, 0L, 2L, Some(666666L), Some(1000000L),
      Some(799999L), 6L, Some(666666L), 488888L)), got("b").toString)
    assert(got("c") === ((0L, 0L, 1L, 1L, None, Some(0L),
      None, 6L, Some(666666L), 488888L)), got("c").toString)
  }

  test("confusionMetrics: weighted F1 is the support-weighted mean (the evaluator's default metric)") {
    // Same frame as the hand-computed test: supports a=3 b=2 c=1;
    // weighted = ⌊(666666·3 + 799999·2 + 0·1)/6⌋ = ⌊3599996/6⌋ = 599999.
    val df = Seq(("a", "a"), ("a", "b"), ("a", "a"),
      ("b", "b"), ("b", "b"), ("c", "a")).toDF("label", "pred")
    val got = Eval.confusionMetrics(df, col("label"), col("pred"))
      .select("weighted_f1_ppm").distinct().as[Long].collect().toSeq
    assert(got == Seq(599999L), got.toString)
  }

  test("confusionMetrics: int labels vs double predictions share class names (MLlib's shape)") {
    // MLlib predictions are DOUBLE; labels are often int. Independent
    // stringification would render '1' vs '1.0' and every row would land
    // off-diagonal silently. The canonical double→string cast keeps them
    // on the diagonal: 3 of 4 correct here.
    val df = Seq((1, 1.0), (1, 1.0), (0, 1.0), (0, 0.0)).toDF("label", "pred")
    val got = Eval.confusionMetrics(df, col("label"), col("pred"))
      .select("class", "tp", "support", "accuracy_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("1.0", 2L, 2L, 750000L), ("0.0", 1L, 2L, 750000L)),
      got.toString)
  }

  test("confusionMetrics: perfect classifier is all-10^6; null rows drop") {
    val df = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("label", "pred")
      .unionByName(Seq((null.asInstanceOf[String], "x"), ("y", null
        .asInstanceOf[String])).toDF("label", "pred"))
    val got = Eval.confusionMetrics(df, col("label"), col("pred"))
      .select("class", "f1_ppm", "accuracy_ppm", "macro_f1_ppm", "total")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("x", 1000000L, 1000000L, 1000000L, 3L),
      ("y", 1000000L, 1000000L, 1000000L, 3L)), got.toString)
  }
}
