package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventsStream

/** Scratch profiler for the streaming bench entries: runs the tumbling agg
  * and the stream-stream interval join under varying shuffle-partition
  * counts, printing per-phase wall times, to locate the fixed overhead the
  * bench pays per streaming query. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // batch twins for reference
    time("batch tumbling agg") {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")).write.format("noop").mode("overwrite").save()
    }

    for (parts <- Seq(32, 8, 2)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"stream tumbling (parts=$parts)") {
        EventsStream.runToNoop(EventsStream.tumblingCounts(EventsStream.read(spark, sfDir)))
      }
      time(s"stream interval join (parts=$parts)") {
        EventsStream.runToNoop(EventsStream.clickPurchaseJoin(EventsStream.read(spark, sfDir)))
      }
    }
    spark.stop()
  }
}
