package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  // Three periods over two buckets: 1→2 identical mix (TVD 0),
  // 2→3 total flip a↔b (TVD 1). Period 1 has no predecessor → dropped.
  private def seriesFixture = Seq(
    (1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "a"), (2L, "a"), (2L, "b"),
    (3L, "b"), (3L, "b"), (3L, "b"), (3L, "a")).toDF("day", "bucket")

  test("tvdSeries: exact numerators, ppm staging, edge period dropped") {
    val got = Drift.tvdSeries(seriesFixture, col("day"), col("bucket"))
      .select("period", "n_prev", "n_cur", "tvd_num", "tvd_ppm", "drifted")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 2, s"period 1 has no predecessor: $got")
    // identical mix: num = Σ|c·4 − cp·4| = 0
    assert(got(2L) == ((2L, 4L, 4L, 0L, 0L, false)), got.toString)
    // flip: |3·4−1·4| + |1·4−3·4| = 16; ppm = 16·10⁶/(2·16) = 500000
    assert(got(3L)._4 == 16L && got(3L)._5 == 500000L, got.toString)
    // alert: mean ppm = 250000; 2·2·500000 > 3·500000 → drifted
    assert(got(3L)._6 && !got(2L)._6, got.toString)
  }

  test("tvdSeries: vanished bucket carries its full mass") {
    // p1: 2a+2b; p2: 4a (b vanished). TVD = |2·4−4·4|+|2·4−0| = 16
    // over 2·4·4 = 0.5
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a"), (2L, "a")).toDF("day", "bucket")
    val r = Drift.tvdSeries(df, col("day"), col("bucket"))
      .select("tvd_num", "tvd_ppm").as[(Long, Long)].head()
    assert(r == ((16L, 500000L)), r.toString)
  }

  test("tvdBetween: verdict thresholds, symmetry of the statistic") {
    val ref = Seq("a", "a", "a", "b").toDF("bucket")
    val cur = Seq("a", "b", "b", "b").toDF("bucket")
    // TVD = (|3·4−1·4| + |1·4−3·4|)/(2·16) = 1/2
    val r = Drift.tvdBetween(ref, col("bucket"), cur, col("bucket"), 1L, 4L)
      .select("n_ref", "n_cur", "tvd_num", "tvd_ppm", "drifted")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(r == ((4L, 4L, 16L, 500000L, true)), r.toString)
    val sym = Drift.tvdBetween(cur, col("bucket"), ref, col("bucket"), 1L, 4L)
      .select("tvd_ppm").as[Long].head()
    assert(sym == 500000L, "TVD is symmetric")
    val lax = Drift.tvdBetween(ref, col("bucket"), cur, col("bucket"), 3L, 4L)
      .select("drifted").as[Boolean].head()
    assert(!lax, "threshold is a real threshold")
  }

  test("tvdBetween: empty sides — one empty is full drift, both empty none") {
    val some = Seq("a", "b").toDF("bucket")
    val none = some.filter(lit(false))
    val oneEmpty = Drift.tvdBetween(some, col("bucket"), none, col("bucket"), 1L, 2L)
      .select("tvd_ppm", "drifted").as[(Long, Boolean)].head()
    assert(oneEmpty == ((1000000L, true)), oneEmpty.toString)
    val bothEmpty = Drift.tvdBetween(none, col("bucket"), none, col("bucket"), 1L, 2L)
      .select("tvd_ppm", "drifted").as[(Long, Boolean)].head()
    assert(bothEmpty == ((0L, false)), bothEmpty.toString)
  }

  test("tvdSeriesBy: groups are isolated — alert mean is per-group, gaps local") {
    // group X: flat then flip (one loud pair); group Y: two flat pairs
    // (all-zero series — nothing may page even though X's pair is huge);
    // group Z: missing middle period — NO pair at all (chain broken).
    val df = Seq(
      ("x", 1L, "a"), ("x", 1L, "b"), ("x", 2L, "a"), ("x", 2L, "b"),
      ("x", 3L, "a"), ("x", 3L, "a"),
      ("y", 1L, "a"), ("y", 2L, "a"), ("y", 3L, "a"),
      ("z", 1L, "a"), ("z", 3L, "a")).toDF("src", "day", "bucket")
    val got = Drift.tvdSeriesBy(df, Seq(col("src")), col("day"), col("bucket"))
      .select("g0", "period", "tvd_ppm", "drifted")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.keySet == Set(("x", 2L), ("x", 3L), ("y", 2L), ("y", 3L)),
      s"z's broken chain must yield no pair: $got")
    // x: day2 identical (0 ppm), day3 flips b->a: |2·2−1·2|+|0·2−1·2| = 4
    // over 2·2·2 = 8 → 500000; per-group mean 250000 → only day3 pages
    assert(got(("x", 2L)) == ((0L, false)) && got(("x", 3L)) == ((500000L, true)), got.toString)
    // y: all-zero series — 2·2·0 > 3·0 is false, nothing pages
    assert(got(("y", 2L)) == ((0L, false)) && got(("y", 3L)) == ((0L, false)), got.toString)
  }

  test("tvdSeriesBy(Nil) == tvdSeries (the global form is the empty grouping)") {
    val a = Drift.tvdSeries(seriesFixture, col("day"), col("bucket"))
      .select("period", "tvd_num", "tvd_ppm", "drifted")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = Drift.tvdSeriesBy(seriesFixture, Nil, col("day"), col("bucket"))
      .select("period", "tvd_num", "tvd_ppm", "drifted")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("tvdAttribution: per-bucket contributions decompose the pair's numerator; top-k ranked") {
    val att = Drift.tvdAttribution(seriesFixture, Nil, col("day"), col("bucket"), k = 2)
      .select("period", "bucket", "c_prev", "c_cur", "contrib_num", "contrib_ppm", "rk")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    // day 3 (the flip): a contributes |1·4−3·4| = 8, b |3·4−1·4| = 8 —
    // tie broken by bucket: a=rank1, b=rank2; each 8/(2·16) = 250000 ppm
    val d3 = att.filter(_._1 == 3L).sortBy(_._7)
    assert(d3.map(r => (r._2, r._5, r._6, r._7)).toSeq ==
      Seq(("a", 8L, 250000L, 1L), ("b", 8L, 250000L, 2L)), att.mkString(", "))
    // decomposition: Σ contrib_num over ALL buckets == the series row's
    // tvd_num for every period (k >= bucket count here, nothing cut)
    val sums = att.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val series = Drift.tvdSeries(seriesFixture, col("day"), col("bucket"))
      .select("period", "tvd_num").as[(Long, Long)].collect().toMap
    assert(sums == series, s"$sums vs $series")
  }

  test("tvdAttribution: k cuts and a vanished bucket attributes its full mass") {
    // p1: 2a+2b; p2: 4a — b's vanish contributes 8, a's growth 8; k=1
    // keeps only the tie-break winner (a)
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a"), (2L, "a")).toDF("day", "bucket")
    val got = Drift.tvdAttribution(df, Nil, col("day"), col("bucket"), k = 1)
      .select("bucket", "c_prev", "c_cur", "contrib_num", "rk")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 2L, 4L, 8L, 1L)), got.mkString(", "))
  }

  test("tvdSeries: non-consecutive periods pair only across gaps of exactly 1") {
    // days 1, 2, 5: day 5 has no day-4 predecessor → only day 2 reports
    val df = Seq((1L, "a"), (2L, "a"), (5L, "a")).toDF("day", "bucket")
    val periods = Drift.tvdSeries(df, col("day"), col("bucket"))
      .select("period").as[Long].collect().toSet
    assert(periods == Set(2L), periods.toString)
  }

  test("driftReport: alerted periods only, joined to their top-k attribution") {
    // seriesFixture: period 2 quiet (TVD 0), period 3 drifted (the flip)
    val got = Drift.driftReport(seriesFixture, Nil, col("day"), col("bucket"), k = 2)
      .select("period", "n_prev", "n_cur", "tvd_num", "tvd_ppm",
        "bucket", "c_prev", "c_cur", "contrib_num", "contrib_ppm", "rk")
      .as[(Long, Long, Long, Long, Long, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._11)
    // only the alerted period appears, once per top-k bucket
    assert(got.map(_._1).toSet === Set(3L), got.mkString(", "))
    assert(got.map(r => (r._6, r._9, r._10, r._11)).toSeq ===
      Seq(("a", 8L, 250000L, 1L), ("b", 8L, 250000L, 2L)), got.mkString(", "))
    // the series stats ride along on every payload row, and the
    // attribution decomposes them: Σ contrib_num == tvd_num
    assert(got.forall(r => r._4 === 16L && r._5 === 500000L))
    assert(got.map(_._9).sum === got.head._4)
  }

  test("driftReport: per-group form pages only the drifting group") {
    // group x: flip between its two periods... but a 1-pair series is
    // always its own mean, so plant 3 periods: quiet, quiet, flip —
    // only the flip alerts; group y stays stationary and silent
    val df = Seq(
      ("x", 1L, "a"), ("x", 1L, "b"), ("x", 2L, "a"), ("x", 2L, "b"),
      ("x", 3L, "a"), ("x", 3L, "b"), ("x", 4L, "b"), ("x", 4L, "b"),
      ("y", 1L, "a"), ("y", 2L, "a"), ("y", 3L, "a"), ("y", 4L, "a")
    ).toDF("grp", "day", "bucket")
    val got = Drift.driftReport(df, Seq(col("grp")), col("day"), col("bucket"), k = 1)
      .select("g0", "period", "bucket", "rk")
      .as[(String, Long, String, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set("x" -> 4L), got.mkString(", "))
  }

  test("tvdSeriesFromCounts == tvdSeries row-for-row (incl. verdicts)") {
    val counts = seriesFixture.groupBy("day", "bucket")
      .agg(count(lit(1)).as("c"))
    val fromCounts = Drift.tvdSeriesFromCounts(counts,
        Nil, col("day"), col("bucket"), col("c"))
      .select("period", "n_prev", "n_cur", "tvd_num", "tvd_ppm", "drifted")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    val fromRows = Drift.tvdSeries(seriesFixture, col("day"), col("bucket"))
      .select("period", "n_prev", "n_cur", "tvd_num", "tvd_ppm", "drifted")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(fromCounts === fromRows)
    assert(fromRows.nonEmpty)
  }

  test("tvdSeriesFromCounts sums duplicate generations (appended micro-batches)") {
    // split each (day, bucket) count into two partial generations —
    // the on-disk layout a streaming append accumulates
    val counts = seriesFixture.groupBy("day", "bucket")
      .agg(count(lit(1)).as("c"))
    val gen1 = counts.withColumn("c", col("c") - 1)
    val gen2 = counts.withColumn("c", lit(1L))
    val appended = gen1.filter(col("c") > 0).unionByName(gen2)
    val got = Drift.tvdSeriesFromCounts(appended,
        Nil, col("day"), col("bucket"), col("c"))
      .select("period", "tvd_num", "tvd_ppm")
      .as[(Long, Long, Long)].collect().toSet
    val want = Drift.tvdSeries(seriesFixture, col("day"), col("bucket"))
      .select("period", "tvd_num", "tvd_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("tvdSeriesFromCounts: grouped form matches tvdSeriesBy") {
    val df = Seq(
      ("x", 1L, "a"), ("x", 1L, "b"), ("x", 2L, "a"), ("x", 2L, "b"),
      ("x", 3L, "b"), ("x", 3L, "b"),
      ("y", 1L, "a"), ("y", 2L, "a"), ("y", 3L, "a")
    ).toDF("grp", "day", "bucket")
    val counts = df.groupBy("grp", "day", "bucket").agg(count(lit(1)).as("c"))
    val got = Drift.tvdSeriesFromCounts(counts, Seq(col("grp")),
        col("day"), col("bucket"), col("c"))
      .select("g0", "period", "tvd_num", "drifted")
      .as[(String, Long, Long, Boolean)].collect().toSet
    val want = Drift.tvdSeriesBy(df, Seq(col("grp")), col("day"), col("bucket"))
      .select("g0", "period", "tvd_num", "drifted")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(want.exists(_._4), "fixture must alert somewhere")
  }

  // ------------------------------------------------------------- PSI

  test("psiSeries: identical mix is 0/stable; flip terms are exact") {
    val got = Drift.psiSeries(seriesFixture, col("day"), col("bucket"))
      .select("period", "n_prev", "n_cur", "n_buckets", "psi_micro", "level")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 2, s"edge period must drop: $got")
    assert(got(2L) == ((2L, 4L, 4L, 2L, 0L, "stable")), got.toString)
    // p3 vs p2 (a: 3→1, b: 1→3), union B=2, both totals 4: smoothed
    // micro-proportions (c+1)·10⁶ div 6 = 333333 / 666666; the expected
    // terms replay the operator's float tree VERBATIM (⌊(p−q)·ln(p/q)⌋
    // per bucket — not an algebraic rearrangement, which could differ
    // in the last ulp)
    def term(p: Long, q: Long): Long =
      math.floor((p - q).toDouble * math.log(p.toDouble / q.toDouble)).toLong
    val want = term(333333L, 666666L) + term(666666L, 333333L)
    assert(got(3L)._5 == want, s"want $want: $got")
    assert(got(3L)._6 == "shifted", got.toString) // ≈ 0.46 PSI
  }

  test("psiSeries: vanished bucket stays finite via add-one smoothing") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a"), (2L, "a")).toDF("day", "bucket")
    val r = Drift.psiSeries(df, col("day"), col("bucket"))
      .select("n_buckets", "psi_micro", "level")
      .as[(Long, Long, String)].head()
    // b vanished entirely: raw PSI would be ±∞; smoothing keeps the
    // term finite and large — and every term is non-negative
    assert(r._1 == 2L && r._2 > 0L, r.toString)
    // a: p=(5·10⁶ div 6)=833333 q=(3·10⁶ div 6)=500000;
    // b: p=(1·10⁶ div 6)=166666 q=500000 — terms replay the
    // operator's tree verbatim
    def term(p: Long, q: Long): Long =
      math.floor((p - q).toDouble * math.log(p.toDouble / q.toDouble)).toLong
    val want = term(833333L, 500000L) + term(166666L, 500000L)
    assert(r._2 == want, s"want $want: $r")
  }

  test("psiSeriesBy: per-group series stay independent") {
    val df = Seq(
      ("g1", 1L, "a"), ("g1", 1L, "b"), ("g1", 2L, "a"), ("g1", 2L, "b"),
      ("g2", 1L, "a"), ("g2", 1L, "a"), ("g2", 2L, "b"), ("g2", 2L, "b"))
      .toDF("grp", "day", "bucket")
    val got = Drift.psiSeriesBy(df, Seq(col("grp")), col("day"), col("bucket"))
      .select("g0", "psi_micro", "level")
      .as[(String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got("g1")._2 == 0L && got("g1")._3 == "stable", got.toString)
    assert(got("g2")._2 > 250000L && got("g2")._3 == "shifted", got.toString)
  }

  test("psiSeriesFromCounts == psiSeries, duplicate generations summed") {
    val df = seriesFixture
    val counts = df.groupBy("day", "bucket").agg(count(lit(1)).as("c"))
    // split every count into two generations (c−1, 1) — appended
    // micro-batches must recombine exactly
    val gen1 = counts.withColumn("c", col("c") - 1).filter(col("c") > 0)
    val gen2 = counts.withColumn("c", lit(1L))
    val got = Drift.psiSeriesFromCounts(gen1.unionByName(gen2), Nil,
        col("day"), col("bucket"), col("c"))
      .select("period", "psi_micro", "level")
      .as[(Long, Long, String)].collect().toSet
    val want = Drift.psiSeries(df, col("day"), col("bucket"))
      .select("period", "psi_micro", "level")
      .as[(Long, Long, String)].collect().toSet
    assert(got === want)
    assert(want.exists(_._3 == "shifted"), "fixture must shift somewhere")
  }

  test("psiSeriesFromCounts: zero-sum generation pairs drop from the histogram") {
    val df = seriesFixture
    val counts = df.groupBy("day", "bucket").agg(count(lit(1)).as("c"))
    // plant a bucket whose generations cancel to 0 (+3 then -3 — a
    // maintained histogram that added then fully retracted): it must
    // NOT inflate the pair's union bucket count _nb, which would shift
    // every bucket's smoothed p/q vs the raw-row path
    val ghost = counts.limit(1)
      .select(col("day"), lit("__ghost").as("bucket"), lit(3L).as("c"))
    val ghostNeg = ghost.withColumn("c", lit(-3L))
    val got = Drift.psiSeriesFromCounts(
        counts.unionByName(ghost).unionByName(ghostNeg), Nil,
        col("day"), col("bucket"), col("c"))
      .select("period", "n_prev", "n_cur", "n_buckets", "psi_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Drift.psiSeries(df, col("day"), col("bucket"))
      .select("period", "n_prev", "n_cur", "n_buckets", "psi_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("psiBetween: stationary passes, vanished bucket shifts, empty fails safe") {
    val ref = Seq("a", "a", "a", "b").toDF("bucket")
    val same = Seq("a", "a", "a", "b").toDF("bucket")
    val s1 = Drift.psiBetween(ref, col("bucket"), same, col("bucket"))
      .select("n_ref", "n_cur", "n_buckets", "psi_micro", "level")
      .as[(Long, Long, Long, Long, String)].head()
    assert(s1 == ((4L, 4L, 2L, 0L, "stable")), s1.toString)
    // candidate lost a 50%-share bucket entirely — the smoothed
    // log-ratio term is large; a SMALL-share vanish on a tiny sample
    // correctly reads only 'moderate' (smoothing damps sampling noise)
    val ref5050 = Seq("a", "a", "a", "a", "a",
      "b", "b", "b", "b", "b").toDF("bucket")
    val noB = Seq("a", "a", "a", "a", "a",
      "a", "a", "a", "a", "a").toDF("bucket")
    val s2 = Drift.psiBetween(ref5050, col("bucket"), noB, col("bucket"))
      .select("psi_micro", "level").as[(Long, String)].head()
    assert(s2._1 > 250000L && s2._2 == "shifted", s2.toString)
    val smallVanish = Drift.psiBetween(ref, col("bucket"),
        Seq("a", "a", "a", "a").toDF("bucket"), col("bucket"))
      .select("level").as[String].head()
    assert(smallVanish == "moderate", smallVanish)
    // both sides empty: NULL psi, level 'shifted' — fail-safe, never
    // silently stable
    val e = Drift.psiBetween(ref.filter(lit(false)), col("bucket"),
        noB.filter(lit(false)), col("bucket"))
      .select("psi_micro", "level").collect().head
    assert(e.isNullAt(0) && e.getString(1) == "shifted", e.toString)
  }

  test("psiBetween direction: PSI is asymmetric, current vs reference") {
    // current concentrated where reference was thin → big terms on the
    // grown bucket; swapping roles changes the number (ln ratio flips
    // but so do the (p−q) weights against different totals)
    val ref = Seq("a", "a", "a", "a", "a", "a", "a", "b").toDF("bucket")
    val cur = Seq("a", "b", "b", "b", "b", "b", "b", "b").toDF("bucket")
    val fwd = Drift.psiBetween(ref, col("bucket"), cur, col("bucket"))
      .select("psi_micro").as[Long].head()
    assert(fwd > 250000L, s"grown tail bucket must shift: $fwd")
  }
}
