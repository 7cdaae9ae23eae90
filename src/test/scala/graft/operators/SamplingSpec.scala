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
}
