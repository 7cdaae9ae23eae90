package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.Tables

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Stage the static events parquet into a stream-source directory. */
  lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("tumbling-window counts match the batch equivalent") {
    // Complete mode emits every window; Append would (correctly) hold back
    // the trailing windows still inside the watermark on static input.
    val streamed = EventsStream.runToMemory(
      EventsStream.tumblingCounts(EventsStream.read(spark, streamDir)),
      "tumbling_test", OutputMode.Complete())
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    assert(streamed.count() == batch.count())
    val joined = streamed.select($"window", $"event_type", $"n".as("ns"))
      .join(batch.select($"window", $"event_type", $"n".as("nb")), Seq("window", "event_type"))
    assert(joined.filter($"ns" =!= $"nb").count() == 0)
  }

  test("sliding-window averages produce overlapping windows") {
    val out = EventsStream.runToMemory(
      EventsStream.slidingAvg(EventsStream.read(spark, streamDir)),
      "sliding_test", OutputMode.Append())
    assert(out.count() > 0)
    // 1h window sliding every 30m -> ~2x as many windows as tumbling 1h
    val tumbling = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour")).count().count()
    assert(out.select("window").distinct().count() > tumbling)
  }

  test("mapGroupsWithState per-user totals equal the batch group-by") {
    val streamed = EventsStream.runToMemory(
      EventsStream.userTotals(EventsStream.read(spark, streamDir)).toDF(),
      "state_test", OutputMode.Update())
    // last update per user holds the final running totals
    val last = streamed.groupBy("user_id").agg(max("n").as("n_stream"))
    val batch = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_batch"))
    val joined = last.join(batch, "user_id")
    assert(joined.filter($"n_stream" =!= $"n_batch").count() == 0)
    assert(joined.count() == batch.count())
  }
}
