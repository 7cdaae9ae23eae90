package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir)

  test("stratifiedExact keeps exactly ceil(frac*n) rows per stratum") {
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 0.2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got.keySet == full.keySet)
    full.foreach { case (lang, n) =>
      assert(got(lang) == math.ceil(0.2 * n).toLong,
        s"lang=$lang n=$n got=${got(lang)}")
    }
  }

  test("stratifiedExact is deterministic and a subset of the input") {
    val a = Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.stratifiedExact(
        docs.repartition(7), col("lang"), col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample must not depend on partitioning")
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(a.forall(all.contains))
  }

  test("stratifiedExact frac=1 returns everything, frac=0 nothing") {
    assert(Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 1.0)
      .count() == docs.count())
    assert(Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 0.0)
      .count() == 0)
  }

  test("weightedTopN is deterministic, n-bounded, and a subset of the input") {
    val a = Sampling.weightedTopN(docs, col("doc_id"), col("n_chars"), 20)
      .select("sid").as[Long].collect().sorted
    val b = Sampling.weightedTopN(
        docs.repartition(7), col("doc_id"), col("n_chars"), 20)
      .select("sid").as[Long].collect().sorted
    assert(a.sameElements(b), "sample must not depend on partitioning")
    assert(a.length == 20)
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(a.forall(all.contains))
  }

  test("weightedTopN matches a driver-side Efraimidis–Spirakis replay") {
    import graft.functions.TextFunctions.portableHash
    // replay the exact key formula on the collected hash values: the
    // operator's top-n must equal the top-n of the full key table
    val keys = docs
      .select(col("doc_id"), col("n_chars").cast("double").as("w"),
        portableHash(col("doc_id").cast("string")).as("h"))
      .collect()
      .map(r => (r.getLong(0),
        math.log((r.getLong(2) + 1).toDouble / 1.152921504606846976e18) / r.getDouble(1)))
    val expect = keys.sortBy { case (id, k) => (-k, id) }.take(15).map(_._1).sorted
    val got = Sampling.weightedTopN(docs, col("doc_id"), col("n_chars"), 15)
      .select("sid").as[Long].collect().sorted
    assert(got.sameElements(expect))
  }

  test("mixtureOrder interleaves sources exactly proportionally to weight") {
    // 20 docs per source; weights 2:1 — at virtual time t source A has
    // contributed floor(2t) docs and B floor(t), so the first 30
    // positions are exactly 20 A + 10 B
    val df = ((1L to 20L).map(i => (i, "A")) ++ (21L to 40L).map(i => (i, "B")))
      .toDF("doc_id", "src")
    val order = Sampling.mixtureOrder(df, col("doc_id"), col("src"),
      Map("A" -> 2.0, "B" -> 1.0), 30).collect()
    assert(order.length == 30)
    val bySrc = order.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc == Map("A" -> 20, "B" -> 10), bySrc.toString)
    // vt never decreases along the emitted order
    val vts = order.map(_.getDouble(3))
    assert(vts.zip(vts.tail).forall { case (a, b) => a <= b })
  }

  test("mixtureOrder excludes unweighted sources and survives repartitioning") {
    val df = ((1L to 10L).map(i => (i, "A")) ++ (11L to 20L).map(i => (i, "ZZZ")))
      .toDF("doc_id", "src")
    val a = Sampling.mixtureOrder(df, col("doc_id"), col("src"),
      Map("A" -> 1.0), 50).collect()
    assert(a.forall(_.getString(1) == "A"), "unweighted sources must not appear")
    assert(a.length == 10)
    val b = Sampling.mixtureOrder(df.repartition(7), col("doc_id"), col("src"),
      Map("A" -> 1.0), 50).collect()
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))),
      "order must not depend on partitioning")
  }

  test("weightedTopNPerStratum keeps exactly n per stratum, deterministically") {
    val got = Sampling.weightedTopNPerStratum(
      docs, col("lang"), col("doc_id"), col("n_chars"), 5)
    val perStratum = got.groupBy("stratum").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perStratum.keySet == full.keySet)
    perStratum.foreach { case (l, n) =>
      assert(n == math.min(5L, full(l)), s"lang=$l got $n")
    }
    val again = Sampling.weightedTopNPerStratum(
      docs.repartition(9), col("lang"), col("doc_id"), col("n_chars"), 5)
    assert(got.select("sid").as[Long].collect().sorted.sameElements(
      again.select("sid").as[Long].collect().sorted))
  }

  test("mixtureManifest sorts globally via range partitioning, not one partition") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "A" else "B"))
      .toDF("doc_id", "src").repartition(8)
    val m = Sampling.mixtureManifest(df, col("doc_id"), col("src"),
      Map("A" -> 3.0, "B" -> 1.0))
    val rows = m.collect()
    assert(rows.length == 4000)
    // globally ordered by vt across ALL partitions
    val vts = rows.map(_.getDouble(3))
    assert(vts.zip(vts.tail).forall { case (a, b) => a <= b })
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "the manifest sort must be a distributed range sort: " + plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"),
      "nothing may funnel through one partition: " + plan.take(1500))
    // exact interleave proportions hold over the full manifest too: at
    // any vt, A has contributed 3x B (until a source runs dry)
    val first1000 = rows.take(1000)
    val a = first1000.count(_.getString(1) == "A")
    assert(a == 750, s"3:1 mix must put 750 A in the first 1000, got $a")
  }

  test("mixtureManifestWide equals the window form, row for row, no per-source window") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "A" else "B"))
      .toDF("doc_id", "src").repartition(8)
    val weights = Map("A" -> 3.0, "B" -> 1.0)
    val window = Sampling.mixtureManifest(df, col("doc_id"), col("src"), weights)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getDouble(3)))
    val wide = Sampling.mixtureManifestWide(df, col("doc_id"), col("src"), weights)
    // k is long in the wide form (the 64-bit rank IS its scale story)
    val wideRows = wide.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(wideRows.sameElements(window),
      s"wide form must reproduce the window manifest exactly; " +
        s"first diff: ${wideRows.zip(window).find(p => p._1 != p._2)}")
    // the scale claim: no window over a per-source partition anywhere —
    // ranks come from the prefixSum two-pass scan
    val plan = wide.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window operator in the wide plan:\n" +
      plan.take(1500))
  }

  test("weightedTopN inclusion is monotone in weight (raising w never evicts)") {
    // E-S property: key = ln(u)/w rises with w (ln u < 0) while every
    // other row's key is untouched — so doubling a sampled row's weight
    // must keep it sampled, for every sampled row at once
    val base = docs.select(col("doc_id"), col("n_chars").cast("double").as("w"))
    val sampled = Sampling.weightedTopN(base, col("doc_id"), col("w"), 12)
      .select("sid").as[Long].collect().toSet
    val boosted = base.withColumn("w",
      when(col("doc_id").isin(sampled.toSeq: _*), col("w") * 2).otherwise(col("w")))
    val after = Sampling.weightedTopN(boosted, col("doc_id"), col("w"), 12)
      .select("sid").as[Long].collect().toSet
    assert(after == sampled,
      s"boosting every winner must preserve the winner set: $sampled vs $after")
  }

  test("weightedTopN favors heavy weights and never samples w <= 0 or null") {
    // 200 light (w=1) vs 200 heavy (w=25) rows + poisoned rows
    val rows = (1L to 200L).map(i => (i, java.lang.Double.valueOf(1.0))) ++
      (201L to 400L).map(i => (i, java.lang.Double.valueOf(25.0))) ++
      Seq((401L, java.lang.Double.valueOf(0.0)), (402L, java.lang.Double.valueOf(-3.0)),
        (403L, null.asInstanceOf[java.lang.Double]))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedTopN(df, col("id"), col("w"), 80)
      .select("sid").as[Long].collect()
    assert(got.forall(_ <= 400L), "w<=0/null rows must never be sampled")
    val heavy = got.count(_ > 200L)
    assert(heavy > 60, s"25x weights should dominate the sample: $heavy/80 heavy")
  }

  test("temperatureAllocation: alpha=0.5 flattens toward uniform, alpha=1 keeps natural shares") {
    // 800/100 split: natural shares 8/9 vs 1/9; sqrt-tempered shares
    // ~0.739 vs 0.261 — the low-resource class gains, the big one loses
    val df = ((1L to 800L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("id", "cls")
    val a5 = Sampling.temperatureAllocation(df, col("cls"), budget = 900L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val a1 = Sampling.temperatureAllocation(df, col("cls"), budget = 900L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // z6 = (888888, 111111), z_sum = 999999; 900·z6 divides exactly
    assert(a1("big") == 800L && a1("small") == 100L,
      s"alpha=1 must track natural shares: $a1")
    assert(a5("small") > 200L && a5("small") < 260L,
      s"alpha=0.5 must lift the small class toward sqrt-share ~0.25: $a5")
    assert(a5("big") + a5("small") <= 900L, "allocation must never exceed the budget")
    assert(900L - (a5("big") + a5("small")) < 2, "floor shortfall is < |classes|")
  }

  test("temperatureDraw returns exactly the allocated rows per class, deterministically") {
    val alloc = Sampling.temperatureAllocation(docs, col("lang"), budget = 200L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val drawn = Sampling.temperatureDraw(docs, col("lang"), col("doc_id"), budget = 200L)
    val perClass = drawn.groupBy("class").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClass == alloc.filter(_._2 > 0), s"draw counts $perClass != alloc $alloc")
    val again = Sampling.temperatureDraw(docs.repartition(7), col("lang"),
      col("doc_id"), budget = 200L)
    assert(drawn.collect().toSet == again.collect().toSet,
      "draw must be partitioning-invariant")
  }

  test("temperatureAllocation rejects degenerate parameters loudly") {
    val df = Seq((1L, "a")).toDF("id", "cls")
    intercept[IllegalArgumentException] {
      Sampling.temperatureAllocation(df, col("cls"), budget = -1L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureAllocation(df, col("cls"), budget = 10L, alpha = 0.0)
    }
  }

  test("epochPlan: cap binds, budget splits by weight, shares are exact integers") {
    // source a: 100 tokens, b: 1000 tokens; equal weights, budget 1000,
    // cap 2 epochs → a's 500-token target wants 5 epochs, capped at 2
    // (planned 200); b runs 0.5 epochs (planned 500)
    val df = Seq(("a", 40L), ("a", 60L), ("b", 1000L)).toDF("src", "tc")
    val plan = Sampling.epochPlan(df, col("src"), col("tc"),
        Map("a" -> 0.5, "b" -> 0.5), budget = 1000L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(plan("a") == ((2L, 100L, 2000000L, 200L, 285714L)), s"got ${plan("a")}")
    assert(plan("b") == ((1L, 1000L, 500000L, 500L, 714285L)), s"got ${plan("b")}")
  }

  test("epochPlan: zero-token and unweighted sources are handled, guards throw") {
    val df = Seq(("a", 100L), ("z", 0L), ("ghost", 50L)).toDF("src", "tc")
    val plan = Sampling.epochPlan(df, col("src"), col("tc"),
      Map("a" -> 0.7, "z" -> 0.3), budget = 100L, maxEpochs = 4.0)
    val rows = plan.collect().map(r => r.getString(0) -> r).toMap
    assert(!rows.contains("ghost"), "sources outside the mixture are excluded")
    assert(rows("z").getLong(3) == 0L && rows("z").getLong(4) == 0L,
      "a zero-token source plans zero epochs")
    assert(rows("a").getLong(5) == 1000000L,
      "the only planned source carries the whole realized mixture")
    intercept[IllegalArgumentException] {
      Sampling.epochPlan(df, col("src"), col("tc"), Map.empty, 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochPlan(df, col("src"), col("tc"), Map("a" -> 0.5), -1L)
    }
  }

  test("mulDivSql/microRatioSql stage exactly at int64-hostile magnitudes") {
    // floor(b*w/s) and floor(a*1e6/b) at operands where the naive
    // product overflows int64 — the staged forms must stay exact
    val big = 8000000000000000L // 8e15
    val got = spark.sql(
      s"SELECT ${Sampling.mulDivSql(big.toString, "900000", "1000000", "div")} AS md, " +
        s"${Sampling.microRatioSql("123456789012345", big.toString, "div")} AS mr")
      .head()
    val expMd = (BigInt(big) * 900000 / 1000000).toLong
    val expMr = (BigInt(123456789012345L) * 1000000 / big).toLong
    assert(got.getLong(0) == expMd && got.getLong(1) == expMr,
      s"staged arithmetic drifted: $got vs ($expMd, $expMr)")
  }
}
