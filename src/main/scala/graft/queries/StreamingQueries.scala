package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventsStream

/** Structured-Streaming coverage wired into the driver gate: the stream
  * runs synchronously to a memory sink over the static events parquet and
  * the result is oracle-checked against DuckDB's batch `time_bucket` —
  * proving the streaming aggregation matches its batch semantics. */
object StreamingQueries {

  private val runId = new AtomicInteger(0)

  val queries: Seq[Q] = Seq(
    Q("q28_stream_tumbling",
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
             |  count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val agg = EventsStream.tumblingCounts(EventsStream.read(s, dir))
        // Complete mode emits every window over the static input; a unique
        // sink name keeps repeated invocations in one session independent.
        val out = EventsStream.runToMemory(agg,
          s"q28_stream_${runId.incrementAndGet()}", OutputMode.Complete())
        out.select(col("window.start").as("ws"), col("event_type"),
          col("n"), round(col("sum_value"), 4).as("sum_value"))
      })
  )
}
