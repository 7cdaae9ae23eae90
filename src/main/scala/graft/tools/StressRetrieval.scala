package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CacheScope
import graft.text.Retrieval

/** Scale probe for the BM25 retrieval family (driver-side tooling):
  * index build + query-batch top-k over a corpus whose vocabulary mixes
  * common terms (high df — the prune keeps many postings) and rare terms
  * (low df — the prune keeps few), which is the regime BM25's idf exists
  * for. Reports the postings→pruned candidate funnel alongside wall
  * times, so "query cost scales with postings-for-query-terms, not
  * corpus" is a measured property rather than a claim. Committed numbers
  * in EXPLAIN.md round 14.
  *
  * Knobs: SPARK_GRAFT_RETRIEVAL_SCALE (docs, default 1,000,000),
  * SPARK_GRAFT_RETRIEVAL_QUERIES (batch size, default 100). */
object StressRetrieval {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_RETRIEVAL_SCALE", "1000000").toLong
    val nq = sys.env.getOrElse("SPARK_GRAFT_RETRIEVAL_QUERIES", "100").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[retrieval] $name%-26s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }

    // 40 tokens/doc: positions 0-9 draw from ~100-value pools (common,
    // df ≈ n/100), positions 10-39 from ~100k pools (rare, df ≈ n/100k).
    def tokenExprs(id: org.apache.spark.sql.Column) = (0 until 40).map { j =>
      val pool = if (j < 10) 100L else 100000L
      hex(xxhash64(lit(j), pmod(id, lit(pool))))
    }
    val corpus = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", tokenExprs(col("id")): _*).as("text"))

    // queries = 8 terms of a pseudo-random existing doc: 2 common + 6 rare
    val qdoc = pmod(col("id") * 1009L + 17L, lit(n))
    val qterms = tokenExprs(qdoc).take(2) ++ tokenExprs(qdoc).slice(10, 16)
    val queries = spark.range(nq)
      .select(col("id").as("qid"), array(qterms: _*).as("qtoks"))

    scala.util.Using.resource(new CacheScope) { scope =>
      val ix = timed(s"index_build_${n / 1000}k") {
        val i = Retrieval.bm25Index(corpus, col("doc_id"),
          split(col("text"), " "), scope)
        println(s"[retrieval] postings rows = ${"%,d".format(i.postings.count())}")
        i
      }
      val pruned = ix.postings.join(
        broadcast(queries.select(explode(col("qtoks")).as("token")).distinct()),
        "token")
      println(s"[retrieval] pruned postings for $nq queries = " +
        s"${"%,d".format(pruned.count())}")
      val top = timed(s"bm25_top10_${nq}q") {
        val t = Retrieval.bm25TopKFromIndex(ix, queries,
          col("qid"), col("qtoks"), 10, scope = scope)
        println(s"[retrieval] result rows = ${t.count()}")
        t
      }
      // re-query against the warm index: the per-batch marginal cost
      timed(s"bm25_top10_${nq}q_warm") {
        Retrieval.bm25TopKFromIndex(ix, queries,
          col("qid"), col("qtoks"), 10, scope = scope).count()
      }
      top.show(5, truncate = false)
    }
    spark.stop()
  }
}
