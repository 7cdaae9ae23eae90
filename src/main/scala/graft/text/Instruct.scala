package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Instruction/chat training-data operators — the post-training side of
  * the corpus pipeline. The reference stops at document-level curation
  * (reference: code/nlp/NLP_Processing.py tokenize/clean stages); an
  * SFT/RLHF data pipeline additionally needs the CONVERSATION shape:
  * per-dialogue role-alternation validation, deterministic chat-template
  * rendering, and the loss-mask spans that tell the trainer which
  * character/token ranges are supervised (assistant turns) versus
  * context-only (user turns).
  *
  * Conversations here are derived from the `events` stream — the engine's
  * interaction log — via the q25 gaps-and-islands sessionization: a
  * user's events within a `gapSec` inactivity window form one dialogue,
  * interaction-shaped event types are the "user" side and
  * response-shaped ones the "assistant" side. The derivation is pure
  * column arithmetic, so every downstream op stays DuckDB-replayable and
  * hash-checked.
  *
  * Scale shape (100 TB events):
  *  - [[turns]] computes sessionization, per-conversation turn index AND
  *    the render prefix offsets over a SINGLE
  *    `hashpartitioning(user_id)` exchange: all five window functions
  *    partition by `user_id` ordered by `(ts, event_id)`; the
  *    per-conversation values (turn index, in-conversation prefix
  *    length) are recovered from per-user running aggregates by
  *    subtracting the running value at the session start (running max of
  *    a session-start-gated column) instead of re-windowing on
  *    `(user_id, session_id)`, which would insert a second full
  *    exchange of the event stream.
  *  - [[alternationAudit]] and [[render]] then aggregate
  *    conversation-sized groups; a conversation is inactivity-bounded by
  *    construction, so per-group state (collect_list in [[render]]) is
  *    bounded the same way session windows are — no unbounded key.
  */
object Instruct {

  /** Event types carrying user intent; everything else (purchase
    * confirmations, errors) is system output — the assistant side. */
  val UserEventTypes: Seq[String] = Seq("click", "view", "signup")

  def role(eventType: Column): Column =
    when(eventType.isin(UserEventTypes: _*), lit("user"))
      .otherwise(lit("assistant"))

  /** Deterministic turn content: the event type plus its JSON payload —
    * both engines see the identical string, keeping renders hashable. */
  def content(eventType: Column, props: Column): Column =
    concat(eventType, lit(" "), props)

  /** One rendered turn: `<|role|>content<|end|>`. The end marker makes
    * the concatenation prefix-free, so span offsets are unambiguous. */
  def turnText(role: Column, content: Column): Column =
    concat(lit("<|"), role, lit("|>"), content, lit("<|end|>"))

  /** events → turn frame: `(user_id, session_id, turn_idx, role,
    * content, turn_len, prefix_len)` where `turn_idx` is 1-based within
    * the conversation and `prefix_len` is the total rendered length of
    * all PRIOR turns of the same conversation (the span-offset input).
    * One exchange, as documented above. */
  def turns(events: DataFrame, gapSec: Long = 3600L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        role(col("event_type")).as("role"),
        content(col("event_type"), col("props")).as("content"))
      .withColumn("turn_len",
        length(turnText(col("role"), col("content"))).cast("long"))
      .withColumn("prev_epoch", unix_timestamp(lag(col("ts"), 1).over(byUser)))
      .withColumn("new_session",
        when(col("prev_epoch").isNull
          || unix_timestamp(col("ts")) - col("prev_epoch") > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum).cast("long"))
      // running per-user row number and rendered length...
      .withColumn("rn", row_number().over(byUser))
      .withColumn("cum_before",
        coalesce(sum(col("turn_len"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // ...rebased to the conversation via the running session-start
      // values (both are monotone per user, so running max = latest)
      .withColumn("start_rn",
        max(when(col("new_session") === 1, col("rn"))).over(cum))
      .withColumn("start_cum",
        max(when(col("new_session") === 1, col("cum_before"))).over(cum))
      .select(col("user_id"), col("session_id"),
        (col("rn") - col("start_rn") + 1).cast("long").as("turn_idx"),
        col("role"), col("content"), col("turn_len"),
        (col("cum_before") - col("start_cum")).as("prefix_len"),
        col("ts"), col("event_id"))
  }

  /** Per-conversation audit: turn/role counts, alternation violations
    * (a turn whose role repeats its predecessor's), boundary-role flags,
    * the composed `valid` gate a curation pipeline filters on, and the
    * supervised-token budget (whitespace tokens of assistant turns vs
    * all turns — what the trainer actually pays for vs feeds). */
  def alternationAudit(turns: DataFrame): DataFrame = {
    val conv = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("turn_idx"))
    val nTok = size(TextFunctions.tokens(col("content"))).cast("long")
    turns
      .withColumn("repeat",
        when(lag(col("role"), 1).over(conv) === col("role"), 1L).otherwise(0L))
      .withColumn("n_tok", nTok)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
        sum(col("repeat")).as("n_repeats"),
        max(when(col("turn_idx") === 1, col("role") === "user")).as("starts_user"),
        max_by(col("role") === "assistant", col("turn_idx")).as("ends_assistant"),
        sum(when(col("role") === "assistant", col("n_tok")).otherwise(0L))
          .as("n_loss_tokens"),
        sum(col("n_tok")).as("n_total_tokens"))
      .withColumn("valid",
        col("starts_user") && col("ends_assistant") && col("n_repeats") === 0)
  }

  /** Loss-mask spans: one row per ASSISTANT turn with the half-open
    * character range `[span_start, span_start + span_len)` of its
    * content inside the conversation's rendered string — the header
    * `<|assistant|>` and the `<|end|>` marker stay unsupervised, which
    * is the standard SFT masking rule (train on responses, not on
    * template scaffolding). */
  def lossSpans(turns: DataFrame): DataFrame =
    turns
      .filter(col("role") === "assistant")
      .select(col("user_id"), col("session_id"), col("turn_idx"),
        (col("prefix_len") + length(concat(lit("<|"), col("role"), lit("|>"))))
          .as("span_start"),
        length(col("content")).cast("long").as("span_len"))

  /** Conversation → one rendered training example: turns concatenated in
    * order. `sort_array(collect_list(struct(turn_idx, turn)))` gives a
    * deterministic order regardless of how rows arrive at the
    * aggregator (collect_list alone has no order contract). */
  def render(turns: DataFrame): DataFrame =
    turns
      .select(col("user_id"), col("session_id"),
        struct(col("turn_idx"),
          turnText(col("role"), col("content")).as("turn")).as("t"))
      .groupBy("user_id", "session_id")
      .agg(array_join(transform(sort_array(collect_list(col("t"))),
        t => t.getField("turn")), "").as("rendered"))
      .withColumn("rendered_len", length(col("rendered")).cast("long"))
}
