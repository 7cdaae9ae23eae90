package graft.text

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class InstructSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Two users; u1 has two sessions (90-min gap), u2 one degenerate
    * all-assistant session. Roles: click/view/signup → user,
    * purchase/error → assistant. */
  private def fixture: DataFrame = Seq(
    // u1 session 1: user, assistant, user, assistant — valid
    (1L, 10L, ts("2024-01-01 10:00:00"), "click", "{\"k\": 1}"),
    (1L, 11L, ts("2024-01-01 10:05:00"), "purchase", "{\"k\": 2}"),
    (1L, 12L, ts("2024-01-01 10:10:00"), "view", "{\"k\": 3}"),
    (1L, 13L, ts("2024-01-01 10:15:00"), "error", "{\"k\": 4}"),
    // u1 session 2 (90-min gap): user, user, assistant — one repeat
    (1L, 14L, ts("2024-01-01 11:50:00"), "signup", "{\"k\": 5}"),
    (1L, 15L, ts("2024-01-01 11:55:00"), "click", "{\"k\": 6}"),
    (1L, 16L, ts("2024-01-01 11:58:00"), "purchase", "{\"k\": 7}"),
    // u2: assistant only — invalid (no user start)
    (2L, 20L, ts("2024-01-01 09:00:00"), "error", "{\"k\": 8}")
  ).toDF("user_id", "event_id", "ts", "event_type", "props")

  private lazy val turns = Instruct.turns(fixture).cache()

  test("turns: sessionization, role mapping, and 1-based turn numbering") {
    val got = rows(turns.select("user_id", "session_id", "turn_idx", "role")
      .orderBy("user_id", "session_id", "turn_idx"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Seq(
      (1L, 1L, 1L, "user"), (1L, 1L, 2L, "assistant"),
      (1L, 1L, 3L, "user"), (1L, 1L, 4L, "assistant"),
      (1L, 2L, 1L, "user"), (1L, 2L, 2L, "user"), (1L, 2L, 3L, "assistant"),
      (2L, 1L, 1L, "assistant")))
  }

  test("turns: prefix_len equals the rendered length of all prior turns") {
    // independent recomputation: group, sort, accumulate string lengths
    val byConv = rows(turns
      .select("user_id", "session_id", "turn_idx", "role", "content", "prefix_len")
      .orderBy("user_id", "session_id", "turn_idx"))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
    byConv.foreach { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(5) === acc, s"prefix_len mismatch at $r")
        acc += s"<|${r.getString(3)}|>${r.getString(4)}<|end|>".length
      }
    }
  }

  test("alternationAudit: counts, violation flags, and the valid gate") {
    val got = rows(Instruct.alternationAudit(turns)
      .orderBy("user_id", "session_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5),
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(10)))
    // (user, session, n_turns, n_repeats, starts_user, ends_assistant, valid)
    assert(got === Seq(
      (1L, 1L, 4L, 0L, true, true, true),
      (1L, 2L, 3L, 1L, true, true, false),
      (2L, 1L, 1L, 0L, false, true, false)))
  }

  test("alternationAudit: loss tokens count only assistant-turn content") {
    val r = rows(Instruct.alternationAudit(turns)
      .filter(col("user_id") === 1 && col("session_id") === 1)).head
    // each content "type {\"k\": N}" is 3 whitespace tokens; 2 of 4 turns
    // are assistant
    assert(r.getAs[Long]("n_loss_tokens") === 6L)
    assert(r.getAs[Long]("n_total_tokens") === 12L)
  }

  test("lossSpans: spans slice exactly the assistant content out of the render") {
    val rendered = rows(Instruct.render(turns))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val spans = rows(Instruct.lossSpans(turns))
    assert(spans.nonEmpty)
    spans.foreach { r =>
      val conv = rendered((r.getLong(0), r.getLong(1)))
      val start = r.getAs[Long]("span_start").toInt
      val len = r.getAs[Long]("span_len").toInt
      val cut = conv.substring(start, start + len)
      assert(cut.matches("(purchase|error) \\{.*\\}"), s"bad span: '$cut'")
      // the span is content-only: scaffolding sits immediately around it
      assert(conv.regionMatches(start - "<|assistant|>".length,
        "<|assistant|>", 0, "<|assistant|>".length))
      assert(conv.regionMatches(start + len, "<|end|>", 0, "<|end|>".length))
    }
  }

  test("render: deterministic order and exact template layout") {
    val r = rows(Instruct.render(turns)
      .filter(col("user_id") === 2 && col("session_id") === 1)).head
    assert(r.getString(2) === "<|assistant|>error {\"k\": 8}<|end|>")
    assert(r.getAs[Long]("rendered_len") === r.getString(2).length.toLong)
  }

  test("turns runs on one user_id exchange: no (user, session) re-shuffle") {
    // fresh frame: the shared `turns` is cached, which would hide the
    // exchanges behind an InMemoryTableScan
    val plan = Instruct.turns(fixture).queryExecution.executedPlan.toString
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty)
    exchanges.foreach(k => assert(!k.contains("session_id"),
      s"turn frame re-exchanged on session key: $k\n$plan"))
  }
}
