package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Scratch: fused single-pass CosineSimilarity vs the composed
  * 3×DotProduct form on the all-pairs corpus scan (4M pairs at sf0.1). */
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("i1"), col("v").as("v1"))
    val b = e.select(col("vec_id").as("i2"), col("v").as("v2"))
    val pairs = a.crossJoin(b)
    def composed = Similarity.dot(col("v1"), col("v2")) /
      (sqrt(Similarity.dot(col("v1"), col("v1"))) * sqrt(Similarity.dot(col("v2"), col("v2"))))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cosine] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (r <- 1 to 2) {
      time(s"r$r composed 3-loop")(
        pairs.select(sum(composed)).collect())
      time(s"r$r fused 1-loop")(
        pairs.select(sum(Similarity.cosine(col("v1"), col("v2")))).collect())
    }
    spark.stop()
  }
}
