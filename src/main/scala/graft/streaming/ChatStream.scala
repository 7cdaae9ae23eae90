package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.Instruct

/** Input row for the streaming chat audit. */
case class ChatEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                     event_type: String, props: String)

/** Open-conversation accumulator (state). `n_turns == 0` marks a CLOSED
  * conversation whose audit was already emitted on timeout; the marker
  * keeps the per-user session counter alive (the [[EventsStream.sessionize]]
  * closed-marker discipline). */
case class OpenChatAudit(session_id: Long, last_ts_ms: Long, n_turns: Long,
                         n_user: Long, n_assistant: Long, n_repeats: Long,
                         starts_user: Boolean, last_assistant: Boolean,
                         n_loss_tokens: Long, n_total_tokens: Long)

/** One emitted audit row — the streaming twin of
  * [[Instruct.alternationAudit]]'s output. */
case class ChatAudit(user_id: Long, session_id: Long, n_turns: Long,
                     n_user: Long, n_assistant: Long, n_repeats: Long,
                     starts_user: Boolean, ends_assistant: Boolean,
                     n_loss_tokens: Long, n_total_tokens: Long, valid: Boolean)

/** Streaming conversation audit: the SFT curation gate
  * ([[Instruct.alternationAudit]]) as an incremental stream — each
  * conversation's audit row emits the moment the dialogue CLOSES (gap
  * observed in-batch, or event-time timeout once the watermark passes
  * last_ts + gap), so downstream curation consumes finished dialogues
  * continuously instead of re-auditing the corpus per batch.
  *
  * Shares [[EventsStream.sessionize]]'s state discipline exactly: state
  * is one accumulator row per user (bounded by |users|, not history),
  * closed conversations leave a counter-preserving marker, timeout
  * timestamps clamp above the current watermark, and the gap rule is the
  * SHARED floored-seconds comparison ([[EventsStream.sameSession]]) —
  * the batch twin ([[Instruct.turns]]) and the DuckDB oracle both diff
  * `unix_timestamp` (floor-to-second) epochs, so a millisecond-exact
  * diff here would split a gap in the (gapSec, gapSec+1) band
  * differently from batch. Role/content/token arithmetic mirrors
  * [[Instruct]] literally (same role partition, same whitespace token
  * count over `event_type ⊔ props`), and the batch==stream parity spec
  * holds the two implementations together. */
object ChatStream {

  private def isUserType(t: String): Boolean =
    Instruct.UserEventTypes.contains(t)

  private def tokCount(eventType: String, props: String): Long =
    (eventType + " " + props).trim.split("\\s+").length.toLong

  def audit(events: DataFrame, gapSec: Long = 3600,
            watermarkDelay: String = "0 seconds"): Dataset[ChatAudit] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(uid: Long, s: OpenChatAudit): ChatAudit =
      ChatAudit(uid, s.session_id, s.n_turns, s.n_user, s.n_assistant,
        s.n_repeats, s.starts_user, s.last_assistant,
        s.n_loss_tokens, s.n_total_tokens,
        s.starts_user && s.last_assistant && s.n_repeats == 0L)

    events.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("props")).as[ChatEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenChatAudit, ChatAudit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[OpenChatAudit]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.update(OpenChatAudit(s.session_id + 1, s.last_ts_ms,
              0L, 0L, 0L, 0L, starts_user = false, last_assistant = false,
              0L, 0L))
            Iterator.single(close(uid, s))
          } else {
            // batch rows arrive unordered; order by (ts, event_id) — the
            // same total order Instruct.turns uses
            val sorted = rows.toIndexedSeq
              .sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[ChatAudit]
            var cur = state.getOption
            sorted.foreach { e =>
              val asst = !isUserType(e.event_type)
              val toks = tokCount(e.event_type, e.props)
              def open(sid: Long) = OpenChatAudit(sid, e.ts.getTime, 1L,
                if (asst) 0L else 1L, if (asst) 1L else 0L, 0L,
                starts_user = !asst, last_assistant = asst,
                if (asst) toks else 0L, toks)
              cur = cur match {
                case Some(s) if s.n_turns == 0L => Some(open(s.session_id))
                case Some(s)
                  if EventsStream.sameSession(s.last_ts_ms, e.ts.getTime, gapSec) =>
                  Some(s.copy(
                    last_ts_ms = math.max(s.last_ts_ms, e.ts.getTime),
                    n_turns = s.n_turns + 1,
                    n_user = s.n_user + (if (asst) 0L else 1L),
                    n_assistant = s.n_assistant + (if (asst) 1L else 0L),
                    n_repeats = s.n_repeats +
                      (if (s.last_assistant == asst) 1L else 0L),
                    last_assistant = asst,
                    n_loss_tokens = s.n_loss_tokens + (if (asst) toks else 0L),
                    n_total_tokens = s.n_total_tokens + toks))
                case Some(s) =>
                  closed ::= close(uid, s)
                  Some(open(s.session_id + 1))
                case None => Some(open(1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(EventsStream.sessionTimeoutMs(s.last_ts_ms, gapSec),
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.reverse.iterator
          }
      }
  }
}
