package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinHashConfig}
import graft.sources.Tables

/** Scratch profiler for the q36 near-dup pipeline stages (driver-side
  * tooling, not part of the engine surface). */
object ProfileQ36 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    for (cfg <- Seq(("md5", MinHashConfig.OraclePinned),
                    ("xx", MinHashConfig.OraclePinned.copy(portable = false)))) {
      val (tag, c) = cfg
      val docs = Tables.documents(spark, sfDir)
      time(s"$tag warm-docs")(docs.write.format("noop").mode("overwrite").save())
      val sh = time(s"$tag shingleHashes scan")(
        { Dedup.shingleHashes(docs, col("doc_id"), col("text"), c.shingleK, c.portable)
            .write.format("noop").mode("overwrite").save() })
      val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), c)
      time(s"$tag signatures")(sigs.write.format("noop").mode("overwrite").save())
      val sigsP = sigs.persist()
      sigsP.count()
      val cand = Dedup.lshCandidates(sigsP, c)
      val nCand = time(s"$tag candidates (cached sigs)")(cand.count())
      val candDocs = cand.select(col("d1").as("cdoc"))
        .union(cand.select(col("d2").as("cdoc"))).distinct()
      val nDocs = time(s"$tag candDocs")(candDocs.count())
      println(s"[profile] $tag n_cand=$nCand n_candDocs=$nDocs")
      time(s"$tag full nearDuplicates")(
        Dedup.nearDuplicates(docs, col("doc_id"), col("text"), 0.8, c)
          .write.format("noop").mode("overwrite").save())
      sigsP.unpersist()
    }
    spark.stop()
  }
}
