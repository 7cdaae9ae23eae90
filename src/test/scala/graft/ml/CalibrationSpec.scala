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

  /** Exact-rational sequential PAVA over sorted (ynum, yden) bins —
    * the independent reference the minimax form must reproduce.
    * Violator compare is cross-multiplied longs (a/b > c/d ⇔ ad > cb),
    * pooled value rounded ONCE at the end, like the operator. */
  private def pavaRef(bins: Seq[(Long, Long, Long)]): Seq[(Long, Double)] = {
    val sorted = bins.sortBy(_._1)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    for ((_, n, d) <- sorted) {
      var cur = (n, d, 1)
      while (st.nonEmpty &&
          st.last._1 * cur._2 > cur._1 * st.last._2) { // prev mean > cur
        val p = st.remove(st.size - 1)
        cur = (p._1 + cur._1, p._2 + cur._2, p._3 + cur._3)
      }
      st += cur
    }
    val fits = st.toSeq.flatMap { case (n, d, c) =>
      Seq.fill(c)(n.toDouble / d.toDouble) }
    sorted.map(_._1).zip(fits)
  }

  test("isotonicBinned == exact-rational PAVA, bit-for-bit, and monotone") {
    // planted violators: rises, dips, recovers, dips again
    val bins = Seq(
      (1L, 0L, 4L), (2L, 3L, 4L), (3L, 1L, 4L), (4L, 2L, 4L),
      (5L, 1L, 1L), (6L, 2L, 4L), (7L, 4L, 4L))
    val rows = bins.flatMap { case (s, n, d) =>
      Seq.fill(n.toInt)((s, 1L)) ++ Seq.fill((d - n).toInt)((s, 0L)) }
    val got = Calibration.isotonicBinned(rows.toDF("s", "y"),
        col("s"), col("y"))
      .orderBy("s").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) === bins, "histogram must match")
    val want = pavaRef(bins)
    assert(got.map(r => (r._1, r._4)) === want,
      s"minimax must equal sequential PAVA exactly:\n$got\nvs $want")
    assert(got.map(_._4).sliding(2).forall(p => p.head <= p.last),
      s"fit must be monotone: $got")
    // the pooled blocks: 0/4 | pool(3/4,1/4,2/4)=6/12 | pool(1/1,2/4)=3/5 | 4/4
    assert(want.map(_._2) === Seq(0.0, 0.5, 0.5, 0.5, 0.6, 0.6, 1.0))
  }

  test("isotonicBinned agrees with Spark ML's fitIsotonic on the bins") {
    // the two implementations share nothing (minimax closed form vs
    // MLlib's distributed pool-merge) — agreement on a violator
    // fixture ties the oracle-tier form to the production seam.
    // Tolerance, not equality: MLlib averages pools in its own
    // float order.
    val bins = Seq(
      (1L, 0L, 4L), (2L, 3L, 4L), (3L, 1L, 4L), (4L, 2L, 4L),
      (5L, 1L, 1L), (6L, 2L, 4L), (7L, 4L, 4L))
    val rows = bins.flatMap { case (s, n, d) =>
      Seq.fill(n.toInt)((s, 1.0)) ++ Seq.fill((d - n).toInt)((s, 0.0)) }
    val df = rows.toDF("s", "y")
    val got = Calibration.isotonicBinned(df, col("s"), col("y"))
      .orderBy("s").as[(Long, Long, Long, Double)].collect()
    val model = Calibration.fitIsotonic(df, col("s"), col("y"))
    val ml = Calibration.calibrate(model,
        bins.map(_._1).toDF("s"), col("s"))
      .orderBy("s").select("calibrated").as[Double].collect()
    got.map(_._4).zip(ml).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"minimax $a vs MLlib $b") }
  }

  test("isotonicBinned matches PAVA on lattice-noise fixtures") {
    // deterministic pseudo-noise over 24 bins, three different lattices
    for (m <- Seq(5L, 11L, 23L)) {
      val bins = (0L until 24L).map { s =>
        val d = 3L + (s * m) % 4L
        val n = ((s * 7L + m) % (d + 1L))
        (s, n, d)
      }
      val rows = bins.flatMap { case (s, n, d) =>
        Seq.fill(n.toInt)((s, 1L)) ++ Seq.fill((d - n).toInt)((s, 0L)) }
      val got = Calibration.isotonicBinned(rows.toDF("s", "y"),
          col("s"), col("y"))
        .orderBy("s").as[(Long, Long, Long, Double)].collect().toSeq
      assert(got.map(r => (r._1, r._4)) === pavaRef(bins), s"lattice $m")
    }
  }
}
