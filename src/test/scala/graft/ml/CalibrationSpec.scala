package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic: PAVA pools violators — hand-computed calibration map") {
    // scores 1..4 with labels (0, 1, 0, 1): the (1@score2, 0@score3)
    // violator pair pools to 0.5; the fitted map is 0, .5, .5, 1
    val df = Seq((1.0, 0.0), (2.0, 1.0), (3.0, 0.0), (4.0, 1.0))
      .toDF("s", "y")
    val m = Calibration.fitIsotonic(df, col("s"), col("y"))
    val out = Calibration.calibrate(m, df, col("s"))
      .select(col("s"), col("calibrated")).as[(Double, Double)]
      .collect().toMap
    assert(out(1.0) == 0.0 && out(4.0) == 1.0)
    assert(math.abs(out(2.0) - 0.5) < 1e-12 && math.abs(out(3.0) - 0.5) < 1e-12,
      s"violator pool must average to 0.5: $out")
  }

  test("isotonic: output is monotone in the score and bounded by the label range") {
    // noisy sigmoid-ish labels over 200 scores
    val rows = (0 until 200).map { i =>
      val s = i / 20.0
      val noisy = (if ((i * 2654435761L) % 97 < 30) 0.0 else 1.0)
      val y = if (s < 4) math.min(noisy, if (i % 3 == 0) 1.0 else 0.0)
              else math.max(noisy, if (i % 4 == 0) 0.0 else 1.0)
      (s, y)
    }
    val df = rows.toDF("s", "y")
    val m = Calibration.fitIsotonic(df, col("s"), col("y"))
    val cal = Calibration.calibrate(m, df.select(col("s")).distinct(), col("s"))
      .select(col("s"), col("calibrated")).as[(Double, Double)]
      .collect().sortBy(_._1)
    cal.sliding(2).foreach { case Array((s1, c1), (s2, c2)) =>
      assert(c2 >= c1 - 1e-12, s"calibration must be monotone: $s1->$c1, $s2->$c2")
    }
    assert(cal.forall { case (_, c) => c >= 0.0 && c <= 1.0 })
    assert(cal.last._2 > cal.head._2, "a real signal must produce a non-flat map")
  }

  test("calibrate keeps every input row and column") {
    val df = Seq((1L, 0.2, "a"), (2L, 0.9, "b")).toDF("id", "s", "tag")
    val m = Calibration.fitIsotonic(
      Seq((0.0, 0.0), (1.0, 1.0)).toDF("s", "y"), col("s"), col("y"))
    val out = Calibration.calibrate(m, df, col("s"))
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("id", "s", "tag", "calibrated"))
  }

  test("null discipline: null scores poison to null calibrated; fit drops null rows") {
    // a null score/label row must neither crash the fit nor the apply
    val train = Seq((Some(0.0), Some(0.0)), (Some(1.0), Some(1.0)),
      (None, Some(1.0)), (Some(0.5), None)).toDF("s", "y")
    val m = Calibration.fitIsotonic(train, col("s"), col("y"))
    val out = Calibration.calibrate(m,
      Seq((1L, Some(0.0)), (2L, Some(1.0)), (3L, None)).toDF("id", "s"),
      col("s"))
      .select(col("id"), col("calibrated")).as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(0.0) && out(2L).contains(1.0))
    assert(out(3L).isEmpty, s"null score must calibrate to null: $out")
  }

  test("calibrate leaves the caller's model instance untouched") {
    val m = Calibration.fitIsotonic(
      Seq((0.0, 0.0), (1.0, 1.0)).toDF("s", "y"), col("s"), col("y"))
    val featBefore = m.getFeaturesCol
    val predBefore = m.getPredictionCol
    Calibration.calibrate(m, Seq(0.4).toDF("s"), col("s")).collect()
    assert(m.getFeaturesCol == featBefore && m.getPredictionCol == predBefore,
      "calibrate must operate on a copy, not mutate the shared model")
  }
}
