package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = Tables.orders(spark, sfDir).cache()

  test("topKPerGroup returns at most k rows per group, ranked correctly") {
    val top = Relational.topKPerGroup(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val counts = top.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(counts <= 3)
    // rank-1 row per customer holds that customer's max price
    val r1 = top.filter($"rnk" === 1).select($"o_custkey", $"o_totalprice".as("p1"))
    val mx = orders.groupBy($"o_custkey").agg(max($"o_totalprice").as("mx"))
    assert(r1.join(mx, "o_custkey").filter($"p1" =!= $"mx").count() == 0)
  }

  test("runningAggs final value per key equals the group total (W1 invariant)") {
    val run = Relational.runningAggs(orders, col("o_custkey"), col("o_orderdate"),
      (_ => sum(col("o_totalprice")), "running_spend"))
    val last = run.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)))
      .filter($"rn" === 1).select($"o_custkey", $"running_spend")
    val tot = orders.groupBy($"o_custkey").agg(sum($"o_totalprice").as("total"))
    val bad = last.join(tot, "o_custkey")
      .filter(abs($"running_spend" - $"total") > 1e-6).count()
    assert(bad == 0)
  }

  test("histogramWithCumsum is monotone and ends at the row count") {
    val h = Relational.histogramWithCumsum(orders, col("o_orderpriority"))
    val cums = h.orderBy("bucket").select("cum_n").collect().map(_.getLong(0))
    assert(cums.sameElements(cums.sorted))
    assert(cums.last == orders.count())
  }

  test("dedupExactKeepFirst keeps min id and counts dups") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "v")
    val got = Relational.dedupExactKeepFirst(df, col("v"), col("id"))
      .orderBy("keeper").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("groupedQuantilesExact matches Spark's exact percentile aggregate") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Relational.groupedQuantilesExact(li, "l_returnflag",
      Seq(("l_quantity", 0.5, "med_q"), ("l_extendedprice", 0.9, "p90_p"),
        ("l_extendedprice", 0.99, "p99_p")), scale = 6)
    val want = li.groupBy("l_returnflag").agg(
      round(expr("percentile(l_quantity, 0.5)"), 6).as("w_med"),
      round(expr("percentile(l_extendedprice, 0.9)"), 6).as("w_p90"),
      round(expr("percentile(l_extendedprice, 0.99)"), 6).as("w_p99"))
    val bad = got.join(want, "l_returnflag")
      .filter($"med_q" =!= $"w_med" || $"p90_p" =!= $"w_p90" || $"p99_p" =!= $"w_p99")
    assert(bad.count() == 0, bad.collect().mkString("; "))
  }

  test("groupedQuantilesExact: single-row group and p=0/p=1 edges") {
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val got = Relational.groupedQuantilesExact(df, "g",
      Seq(("v", 0.0, "q0"), ("v", 0.5, "q50"), ("v", 1.0, "q100")))
      .orderBy("g").collect()
    assert(got(0).getDouble(1) == 10.0 && got(0).getDouble(2) == 10.0
      && got(0).getDouble(3) == 10.0)
    assert(got(1).getDouble(1) == 1.0 && got(1).getDouble(2) == 2.5
      && got(1).getDouble(3) == 4.0)
  }

  test("asOfJoin picks the latest right row at-or-before each left time, per key") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "t", "v")
    val r = Seq((1L, 10L, 100L), (1L, 18L, 200L), (2L, 99L, 300L))
      .toDF("k", "rt", "x")
    val got = Relational.asOfJoin(l, r, "k", "t", "rt", Seq("rt", "x"))
      .orderBy("k", "t")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) -1L else row.getLong(3),
        if (row.isNullAt(4)) -1L else row.getLong(4))).toSeq
    // (1,10) matches the equal-timestamp right row (inclusive); (2,15)
    // precedes every right row for key 2 -> nulls
    assert(got == Seq((1L, 10L, "a", 10L, 100L), (1L, 20L, "b", 18L, 200L),
      (2L, 15L, "c", -1L, -1L)), got)
  }

  test("asOfJoin carries the latest right ROW atomically — a null field must not resurrect older values") {
    val l = Seq((1L, 25L)).toDF("k", "t")
    val r = Seq((1L, 10L, Some(5L)), (1L, 20L, None))
      .toDF("k", "rt", "x")
    val row = Relational.asOfJoin(l, r, "k", "t", "rt", Seq("rt", "x")).head
    // latest right row is (rt=20, x=NULL): rt and x must come from THAT row
    assert(row.getLong(2) == 20L, s"rt must be 20, got $row")
    assert(row.isNullAt(3), s"x must be NULL (not resurrected 5), got $row")
  }

  test("asOfJoin never matches a NULL right timestamp (ASOF semantics)") {
    val l = Seq((1L, 5L)).toDF("k", "t")
    val r = Seq((1L, Option.empty[Long], 7L)).toDF("k", "rt", "x")
    val row = Relational.asOfJoin(l, r, "k", "t", "rt", Seq("rt", "x")).head
    assert(row.isNullAt(2) && row.isNullAt(3),
      s"NULL-rt right row must not match, got $row")
  }

  test("asOfJoin matches a driver-side reference on randomized seeded data") {
    val rng = new scala.util.Random(7)
    val lRows = Seq.fill(300)((rng.nextInt(20).toLong, rng.nextInt(1000).toLong))
    val rRows = Seq.fill(200)((rng.nextInt(20).toLong, rng.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, rng.nextInt(100).toLong) }
    val l = lRows.toDF("k", "t")
    val r = rRows.toDF("k", "rt", "x")
    val got = Relational.asOfJoin(l, r, "k", "t", "rt", Seq("rt", "x"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some((row.getLong(2), row.getLong(3)))))
      .groupBy(identity).view.mapValues(_.length).toMap
    val byKey = rRows.groupBy(_._1)
    val want = lRows.map { case (k, t) =>
      val m = byKey.getOrElse(k, Nil).filter(_._2 <= t)
      (k, t, if (m.isEmpty) None else Some {
        val best = m.maxBy(_._2); (best._2, best._3)
      })
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == want)
  }

  test("rangeJoin equals the naive inequality join, with no nested-loop in the plan") {
    val pts = Seq(1.0, 49.9, 50.0, 99.9, 150.0, -20.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 50.0), (11L, 40.0, 90.0), (12L, -50.0, -10.0))
      .toDF("iid", "lo", "hi")
    val got = Relational.rangeJoin(pts, col("p"), ivs, col("lo"), col("hi"), 50.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(ivs).filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"got=$got naive=$naive")
    val plan = Relational.rangeJoin(pts, col("p"), ivs, col("lo"), col("hi"), 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("fuzzyPairsBlocked equals the direct theta-join form, with no nested-loop in the plan") {
    // q56's corpus: the nation dimension at the oracle's maxDist
    val nation = Tables.nation(spark, sfDir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "dist").collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue)).toSet
    val direct = pairSet(Relational.fuzzyPairs(nation, $"n_nationkey", $"n_name", 5))
    val blocked = pairSet(Relational.fuzzyPairsBlocked(nation, $"n_nationkey", $"n_name", 5))
    assert(blocked == direct, s"blocked=$blocked direct=$direct")
    // adjacent-band coverage: lengths straddling the band boundary
    // (bandW = 3 → "ab" is band 0, "abcd" band 1, dist 2 ≤ maxDist 2)
    val edge = Seq((1L, "ab"), (2L, "abcd"), (3L, "abcdefgh"), (4L, "xy"),
      (5L, "abce"), (6L, "")).toDF("id", "name")
    val de = pairSet(Relational.fuzzyPairs(edge, $"id", $"name", 2))
    val be = pairSet(Relational.fuzzyPairsBlocked(edge, $"id", $"name", 2))
    assert(be == de, s"blocked=$be direct=$de")
    assert(de.contains((1L, 2L, 2L))) // the cross-band pair really is in play
    val plan = Relational.fuzzyPairsBlocked(nation, $"n_nationkey", $"n_name", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("TopKSmallest aggregator equals sort+limit per group; sampleBy stratifies deterministically") {
    val agg = new TopKSmallest(3).toColumn
    val got = orders
      .groupByKey(r => r.getAs[Long]("o_custkey"))(org.apache.spark.sql.Encoders.scalaLong)
      .mapValues(r => r.getAs[Double]("o_totalprice").toLong)(
        org.apache.spark.sql.Encoders.scalaLong)
      .agg(agg.name("top3"))
      .collect().toMap
    val want = orders.select($"o_custkey", $"o_totalprice".cast("long").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(3).toSeq).toMap
    assert(got.keySet == want.keySet)
    assert(got.forall { case (k, v) => want.get(k).contains(v) },
      got.collectFirst { case (k, v) if !want.get(k).contains(v) =>
        s"$k: $v vs ${want.get(k)}" })
    // stratified sampling (P14 family): seeded fractions per stratum
    val fracs = Map("F" -> 0.5, "O" -> 0.1, "P" -> 0.9)
    val s1 = orders.stat.sampleBy("o_orderstatus", fracs, 42L).count()
    val s2 = orders.stat.sampleBy("o_orderstatus", fracs, 42L).count()
    assert(s1 == s2 && s1 > 0 && s1 < orders.count())
  }

  test("crossTab fills empty cells with zero") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("r", "c")
    val got = Relational.crossTab(df, col("r"), col("c"), Seq("x", "y"))
      .orderBy("r").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 2L, 0L), ("b", 0L, 1L)))
  }

  test("resampleMixture: integer copies exact, zero-copy rows dropped, default 1.0") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "cls")
    val out = Relational.resampleMixture(df, col("id"), col("cls"),
      Map("a" -> 3.0, "b" -> 0.0))
    // integer weights have no hash fraction: exactly 3 copies per 'a' row
    assert(out.filter($"cls" === "a").count() == 200 * 3)
    // weight 0 drops the class entirely (no [1,0] descending-sequence leak)
    assert(out.filter($"cls" === "b").count() == 0)
    // absent class defaults to weight 1
    val one = Relational.resampleMixture(df, col("id"), col("cls"), Map("b" -> 2.0))
    assert(one.filter($"cls" === "a").count() == 200)
    // fractional weight lands near its expectation and is deterministic
    val half = Relational.resampleMixture(df, col("id"), col("cls"), Map("a" -> 0.5))
      .filter($"cls" === "a")
    val n1 = half.count()
    assert(math.abs(n1 - 100L) < 40, s"0.5x of 200 gave $n1")
    assert(n1 == Relational.resampleMixture(df, col("id"), col("cls"), Map("a" -> 0.5))
      .filter($"cls" === "a").count())
  }

  test("applyCdc: update wins by version, delete drops, insert lands, base survives") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val chg = Seq(
      (1L, "a1", 1L, "U"), (1L, "a2", 2L, "U"), // two updates: highest version wins
      (2L, "b", 1L, "D"),                       // delete
      (9L, "i", 1L, "I"),                       // insert
      (8L, "x", 1L, "I"), (8L, "x", 2L, "D")    // insert then delete: gone
    ).toDF("k", "v", "version", "op")
    val got = Relational.applyCdc(base, chg, "k", "version", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a2", 2L), (3L, "c", 0L), (9L, "i", 1L)))
  }

  test("prefixSum equals the single-partition window, including negative values") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // signed values: a max-of-running-sum offset derivation would corrupt
    // every partition after the first — the fold must be exact for any sign
    val df = (1L to 5000L).map(i => (i, ((i * 2654435761L) % 97) - 48))
      .toDF("k", "v").repartition(13)
    val got = Relational.prefixSum(df, col("k"), col("v"))
    val gotMap = got.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val expect = df.withColumn("running",
        sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(gotMap == expect)
    // different partition counts give identical results
    val again = Relational.prefixSum(df, col("k"), col("v"), partitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(again == expect)
    // the bulk data is range-partitioned once; the emitted frame keeps
    // that partitioning (n output partitions, ordered ranges)
    assert(got.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("hierarchyDepth: a 1000-deep chain resolves (log-round doubling), forest ok") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // chain 0<-1<-2<-...<-999 plus a second root 5000 with one child
    val rows = (0L to 999L).map(i => (i, if (i == 0) None else Some(i - 1))) ++
      Seq((5000L, None), (5001L, Some(5000L)))
    val df = rows.toDF("id", "parent")
    val got = Relational.hierarchyDepth(df, col("id"), col("parent"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == rows.size)
    assert(got(0L) == 0L && got(999L) == 999L && got(500L) == 500L)
    assert(got(5000L) == 0L && got(5001L) == 1L)
  }

  test("hierarchyDepth throws loudly on cycles and respects maxDoubling") {
    import org.apache.spark.sql.functions.col
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("id", "parent")
    val e = intercept[IllegalArgumentException](
      Relational.hierarchyDepth(cyc, col("id"), col("parent"), maxDoubling = 4))
    assert(e.getMessage.contains("unresolved"))
    // a 40-deep chain cannot resolve with only 2 doubling rounds (max 4 hops)
    val chain = (0L to 40L).map(i => (i, if (i == 0) None else Some(i - 1)))
      .toDF("id", "parent")
    intercept[IllegalArgumentException](
      Relational.hierarchyDepth(chain, col("id"), col("parent"), maxDoubling = 2))
    // ...and resolves with 6 (2^6 = 64 >= 40)
    val ok = Relational.hierarchyDepth(chain, col("id"), col("parent"), maxDoubling = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ok(40L) == 40L)
  }

  test("hierarchyDepth: finished walks leave the join — round inputs shrink on a shallow forest") {
    import org.apache.spark.sql.functions.col
    // the Reddit-thread shape: 100 flat trees (root + 8 depth-1 children)
    // plus ONE 20-deep chain; almost every walk finishes in round 1
    val flat = (0L until 100L).flatMap { r =>
      (r, None) +: (0L until 8L).map(c => (1000L + r * 8 + c, Some(r)))
    }
    val chain = (0L to 19L).map(i => (10000L + i, if (i == 0) None else Some(10000L + i - 1)))
    val df = (flat ++ chain).toDF("id", "parent")
    val probes = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val got = Relational.hierarchyDepth(df, col("id"), col("parent"),
        roundProbe = (r, open) => probes += ((r, open)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(10019L) == 19L && got(1000L) == 1L && got(0L) == 0L)
    assert(got.size == flat.size + chain.size)
    // round 0 advances all 819 open walks; every depth-1 child resolves
    // there, so round 1's join input is just the deep chain's remainder
    val open = probes.sortBy(_._1).map(_._2)
    assert(open.head == 819L, s"round 0 must see all non-roots: $open")
    assert(open(1) <= 19L, s"round 1 must only carry the deep chain: $open")
    assert(open == open.sorted.reverse && open.distinct == open,
      s"open-walk counts must strictly shrink: $open")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; null payloads don't lie") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (5L, Option.empty[String])).toDF("id", "v")
    val neu = Seq((2L, Some("b")), (3L, Some("C2")), (4L, Some("d")),
      (5L, Option.empty[String])).toDF("id", "v")
    val got = Relational.snapshotDiff(old, neu, col("id"), col("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added",
      // present in both with a NULL payload — unchanged, NOT added:
      // presence is tracked by markers, comparison is null-safe
      5L -> "unchanged"))
    // null → value transition is a change
    val got2 = Relational.snapshotDiff(
        Seq((5L, Option.empty[String])).toDF("id", "v"),
        Seq((5L, Some("x"))).toDF("id", "v"), col("id"), col("v"))
      .as[(Long, String)].head()
    assert(got2 == (5L -> "changed"))
  }
}
