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
}
