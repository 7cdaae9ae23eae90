package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinHashConfig}

/** Scratch: does repartitioning a single-row-group scan before the
  * CPU-bound per-token stages pay for its shuffle at local scale? Times
  * the heaviest map-side pipeline (64-perm minhash, md5-portable and
  * xxhash) against the raw 1-task scan vs a defaultParallelism-wide
  * repartition, interleaved twice to factor out warmup drift. */
object ProfileBalance {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val wide = raw.repartition(spark.sparkContext.defaultParallelism)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[balance] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def run(df: org.apache.spark.sql.DataFrame, cfg: MinHashConfig): Unit =
      Dedup.minhashSignatures(df, col("doc_id"), col("text"), cfg)
        .write.format("noop").mode("overwrite").save()
    val md64 = MinHashConfig.generated(64, 16, portable = true)
    val xx64 = MinHashConfig.generated(64, 16, portable = false)
    for (round <- 1 to 2) {
      time(s"r$round raw   64-perm md5")(run(raw, md64))
      time(s"r$round wide  64-perm md5")(run(wide, md64))
      time(s"r$round raw   64-perm xxhash")(run(raw, xx64))
      time(s"r$round wide  64-perm xxhash")(run(wide, xx64))
    }
    spark.stop()
  }
}
