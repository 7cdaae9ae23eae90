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
}
