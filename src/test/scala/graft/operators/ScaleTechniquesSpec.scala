package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The explicit scale techniques: salted skew joins, bucketed co-located
  * joins, approximate aggregates — each proven against its exact
  * counterpart. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows under heavy skew") {
    // skewed left: 90% of rows share one key
    val left = spark.range(2000)
      .select((when($"id" % 10 === 0, $"id" % 5 + 100).otherwise(0L)).as("k"),
        $"id".as("payload"))
    val right = Seq((0L, "hot"), (100L, "a"), (101L, "b"), (102L, "c"),
      (103L, "d"), (104L, "e")).toDF("k", "v")
    val plain = left.join(right, "k")
    val salted = Relational.saltedJoin(left, right, "k", col("payload"), 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "v")
      .exceptAll(plain.select("k", "payload", "v")).count() == 0)
    // the join shuffle key must include the salt
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
  }

  test("bucketed tables co-locate the join: no shuffle exchange (SURVEY §4)") {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    c.withColumn("c_key", $"c_custkey").write.mode("overwrite")
      .bucketBy(8, "c_key").sortBy("c_key").saveAsTable("customer_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), $"o_custkey" === $"c_key")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() == o.join(c, $"o_custkey" === $"c_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("HLL sketches are mergeable across partitions (hll_sketch_agg/union/estimate)") {
    // the re-aggregatable form a 100 TB rollup needs: per-group sketches
    // built independently, merged, estimated — no re-scan of raw data
    val li = Tables.lineitem(spark, sfDir)
    val perFlag = li.groupBy("l_returnflag")
      .agg(hll_sketch_agg($"l_partkey").as("sk"),
        countDistinct($"l_partkey").as("exact"))
    val bad = perFlag
      .select(hll_sketch_estimate($"sk").cast("double").as("est"),
        $"exact".cast("double"))
      .filter(abs($"est" - $"exact") / $"exact" > 0.05)
    assert(bad.count() == 0)
    // merging the per-group sketches estimates the global cardinality
    val merged = perFlag.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).cast("double")).head.getDouble(0)
    val global = li.select(countDistinct($"l_partkey").cast("double")).head.getDouble(0)
    assert(math.abs(merged - global) / global < 0.05, s"merged=$merged global=$global")
  }

  test("bloomPruned: superset of matches, honest pruning, exact join unchanged") {
    val li = Tables.lineitem(spark, sfDir)
    val hot = Tables.part(spark, sfDir).filter($"p_partkey" % 10 === 3)
    val pruned = Relational.bloomPruned(li, $"l_partkey", hot, $"p_partkey",
      estimatedItems = 1000L, numBits = 64L * 1024)
    val nBig = li.count(); val nPruned = pruned.count()
    val nMatch = li.join(hot, $"l_partkey" === $"p_partkey", "left_semi").count()
    assert(nPruned >= nMatch, "bloom must never drop a matching row")
    assert(nPruned < nBig, s"bloom pruned nothing ($nPruned of $nBig)")
    // exact join on survivors == plain join (false positives fall out)
    val a = pruned.join(hot, $"l_partkey" === $"p_partkey").count()
    val b = li.join(hot, $"l_partkey" === $"p_partkey").count()
    assert(a == b)
    // probe is a per-row filter: no exchange added on the big side
    val p = pruned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("bloomPruned on an empty small side keeps schema and drops everything") {
    val li = Tables.lineitem(spark, sfDir)
    val none = Tables.part(spark, sfDir).filter($"p_partkey" < 0)
    val pruned = Relational.bloomPruned(li, $"l_partkey", none, $"p_partkey")
    assert(pruned.count() == 0)
    assert(pruned.schema == li.schema)
  }

  test("approx_count_distinct lands within 5% of exact; approx percentile sane") {
    val li = Tables.lineitem(spark, sfDir)
    val Array(approx, exact) = li.select(
      approx_count_distinct($"l_partkey").cast("double"),
      countDistinct($"l_partkey").cast("double")).head.toSeq
      .map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
    val (lo, hi) = (
      li.agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000))).head.getDouble(0),
      li.agg(expr("percentile(l_extendedprice, 0.5)")).head.getDouble(0))
    assert(math.abs(lo - hi) / hi < 0.02, s"approx_median=$lo exact=$hi")
  }

  test("count-min sketch: heavy-hitter counts bounded by eps*N, sketches mergeable") {
    import java.io.ByteArrayInputStream
    import org.apache.spark.util.sketch.CountMinSketch
    // 1000 'hot' + 1000 singletons; eps=0.001 -> overcount <= 2 w.p. 0.99
    val df = (1 to 2000).map(i => if (i % 2 == 0) "hot" else s"t$i")
      .toDF("t").repartition(8)
    def sketch(d: org.apache.spark.sql.DataFrame): CountMinSketch =
      CountMinSketch.readFrom(new ByteArrayInputStream(
        d.agg(count_min_sketch($"t", lit(0.001d), lit(0.99d), lit(42))).head
          .getAs[Array[Byte]](0)))
    val whole = sketch(df)
    assert(whole.estimateCount("hot") >= 1000L &&
      whole.estimateCount("hot") <= 1002L, whole.estimateCount("hot").toString)
    assert(whole.estimateCount("absent") <= 2L)
    // the distributed story: per-split sketches merge to the global one
    val merged = sketch(df.filter($"t" =!= "hot"))
    merged.mergeInPlace(sketch(df.filter($"t" === "hot")))
    assert(merged.estimateCount("hot") == whole.estimateCount("hot"))
  }
}
