package graft.tools

import org.apache.spark.sql.SparkSession

/** Print selected effective SQL confs (experiment passthrough check). */
object ConfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.join.preferSortMergeJoin",
      "spark.sql.files.maxPartitionBytes",
      "spark.io.compression.codec")
    for (k <- keys)
      println(s"[conf] $k = ${spark.conf.getOption(k).getOrElse("(default)")}")
    spark.stop()
  }
}
