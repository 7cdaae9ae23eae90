package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Preference/RLHF data construction — the post-training data shape next
  * to the SFT chat family ([[Instruct]]): given conversations derived
  * from the events stream, build preference PAIRS (chosen/rejected
  * responses to the same prompt), audit annotator agreement over them,
  * and fit per-source strengths from pairwise outcomes
  * ([[graft.operators.BradleyTerry]]). Reference tie-in: extends the
  * reference's sentiment-label pipeline
  * (reference: code/nlp/Sentiment_Analysis.py:95-123, single-example
  * labels) to the PAIRWISE form reward-model training consumes.
  *
  * Everything here is integer arithmetic over the shared turn frame
  * (scores, hashes, integer-division ratios), so every op is
  * DuckDB-replayable and hash-checked end to end — the determinism
  * discipline of the label-prop/temperature families.
  *
  * Scale shape (100 TB events):
  *  - [[pairs]]: one conversation-level aggregate (the
  *    [[Instruct.alternationAudit]] arithmetic fused with the prompt
  *    key — zero exchanges beyond the turn frame's own), then ONE
  *    window over `prompt` — adjacent-rank pairing emits n−1 pairs per
  *    prompt group (linear, never the all-pairs K²). The window's scale
  *    contract: prompt keys in real SFT data are high-cardinality (the
  *    actual prompt text/hash), so groups are small and spread; the
  *    synthetic corpus's 5 event-type prompts are the test fixture, not
  *    the shape — a deployment with a handful of mega-prompts uses
  *    [[pairsRangePartitioned]], the IMPLEMENTED q130-style
  *    range-partitioned form of the same pairing (spec-pinned equal).
  *  - [[agreement]]: explode ×|annotators| (a constant) + two
  *    map-side-combinable aggregations. No joins, no windows.
  */
object Preference {

  /** Conversation quality score for preference ranking: validity
    * dominates (a well-formed dialogue always beats a malformed one),
    * then the supervised-token budget. Pure int64 — replayable. */
  def qualityScore(valid: Column, nLossTokens: Column): Column =
    when(valid, 100000L).otherwise(0L) + nLossTokens

  /** Preference pairs from the turn frame ([[Instruct.turns]]):
    * conversations answering the SAME PROMPT (first turn's event type —
    * the task category) are ranked by [[qualityScore]] and paired
    * ADJACENTLY in rank order (chosen = higher, rejected = next lower,
    * `margin` = score difference). Adjacent pairing is the
    * bounded-output construction: n−1 pairs per prompt group versus the
    * quadratic all-pairs form, while still covering the full ranking
    * chain. Zero-margin (tied) pairs are dropped — a preference pair
    * with no strict preference teaches a reward model nothing and its
    * chosen/rejected orientation would be tie-break noise.
    *
    * Output: `(prompt, c_user, c_session, r_user, r_session, margin)`
    * with `margin > 0`. Deterministic: ties in score order break by
    * `(user_id, session_id)`, so the pairing is a pure function of the
    * events table. */
  def pairs(turns: DataFrame): DataFrame = {
    val byRank = Window.partitionBy(col("prompt"))
      .orderBy(col("score").desc, col("user_id"), col("session_id"))
    scoredConversations(turns)
      .withColumn("r_user", lead(col("user_id"), 1).over(byRank))
      .withColumn("r_session", lead(col("session_id"), 1).over(byRank))
      .withColumn("r_score", lead(col("score"), 1).over(byRank))
      .filter(col("r_user").isNotNull && col("score") > col("r_score"))
      .select(col("prompt"),
        col("user_id").as("c_user"), col("session_id").as("c_session"),
        col("r_user"), col("r_session"),
        (col("score") - col("r_score")).as("margin"))
  }

  /** [[pairs]] with the prompt-keyed window replaced by the q130
    * seeded-shuffle family's RANGE-PARTITIONED formulation — the
    * mega-prompt fallback the `pairs` contract names: when prompt
    * cardinality is LOW (a handful of task categories over billions of
    * conversations), `Window.partitionBy(prompt)` funnels each prompt's
    * whole group through one task; this variant computes the global row
    * number of the exact same total order `(prompt, score desc, user,
    * session)` via [[graft.operators.Relational.prefixSum]] (range
    * exchange — balanced regardless of prompt skew) and recovers
    * adjacent-rank pairing as an EQUI-JOIN on the row number (unique
    * 8-byte key, perfectly spread; a global successor within the same
    * prompt IS the adjacent-rank successor). Identical output to
    * [[pairs]] — spec-pinned — at the cost of prefixSum's extra
    * materialization; prefer [[pairs]] when prompts are
    * high-cardinality. */
  def pairsRangePartitioned(turns: DataFrame, partitions: Int = 0): DataFrame = {
    val ord = struct(col("prompt"), (-col("score")).as("nscore"),
      col("user_id"), col("session_id"))
    val ranked = graft.operators.Relational.prefixSum(
      scoredConversations(turns), ord, lit(1L), partitions)
    val right = ranked.select(col("prompt").as("r_prompt"),
      col("user_id").as("r_user"), col("session_id").as("r_session"),
      col("score").as("r_score"), (col("running") - 1L).as("running"))
    ranked.join(right, Seq("running"))
      .filter(col("prompt") === col("r_prompt") && col("score") > col("r_score"))
      .select(col("prompt"),
        col("user_id").as("c_user"), col("session_id").as("c_session"),
        col("r_user"), col("r_session"),
        (col("score") - col("r_score")).as("margin"))
  }

  /** Rejection-sampling selection (best-of-n distillation): per prompt,
    * keep the single highest-scoring conversation and emit its rendered
    * training string — the SFT pack distilled from an implicit reward
    * over the prompt's n candidates (the standard best-of-n op between
    * a reward signal and SFT). Selection is ONE map-side-combinable
    * aggregation — `max` of an ordering struct, no prompt-keyed window,
    * so [[pairs]]' mega-prompt hazard cannot arise. The winner frame is
    * |prompts| rows — and prompts are normally HIGH-cardinality (real
    * prompt text/hash), so the frame is corpus-scale (|conversations|/n)
    * and an unconditional broadcast hint would OOM the driver at 100×
    * (the robotsGate lesson). The hint is therefore SIZE-GUARDED: the
    * winner frame is persisted (two readers: the guard count and the
    * join), broadcast only under `maxBroadcastWinners`, else a plain
    * equi-join on (user_id, session_id) — a unique 2-int key, perfectly
    * spread. Ordering matches [[pairs]]: score desc, ties to the
    * smallest (user_id, session_id). */
  def bestOf(turns: DataFrame,
             maxBroadcastWinners: Long = 4000000L,
             scope: graft.operators.CacheScope =
               graft.operators.CacheScope.unmanaged): DataFrame = {
    val winner = scope.persist(scoredConversations(turns)
      .groupBy("prompt")
      .agg(max(struct(col("score"),
        (-col("user_id")).as("nu"), (-col("session_id")).as("ns"))).as("w"))
      .select(col("prompt"), col("w.score").as("score"),
        (-col("w.nu")).as("user_id"), (-col("w.ns")).as("session_id")))
    val hinted =
      if (winner.count() <= maxBroadcastWinners) broadcast(winner) else winner
    Instruct.render(turns)
      .select(col("user_id"), col("session_id"), col("rendered"))
      .join(hinted, Seq("user_id", "session_id"))
      .select(col("prompt"), col("user_id"), col("session_id"),
        col("score"), col("rendered").as("best_response"))
  }

  /** Shared conversation-scoring stage of [[pairs]] /
    * [[pairsRangePartitioned]]: ONE pass over the turn frame — the
    * audit columns the score needs (the [[Instruct.alternationAudit]]
    * arithmetic) and the prompt key ride the SAME (user, session)
    * aggregation — a separate audit-frame ⋈ prompt-frame formulation
    * evaluates the events-scale turn derivation twice and pays a
    * conversation-keyed join for a value one
    * `max(when(turn_idx = 1, …))` recovers for free. The lag window and
    * the aggregation both cluster by (user, session), which the turn
    * frame's user_id partitioning already satisfies — so this whole
    * stage adds ZERO exchanges beyond the turn frame's own. */
  private def scoredConversations(turns: DataFrame): DataFrame = {
    val conv = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("turn_idx"))
    val nTok = size(TextFunctions.tokens(col("content"))).cast("long")
    turns
      .withColumn("repeat",
        when(lag(col("role"), 1).over(conv) === col("role"), 1L).otherwise(0L))
      .withColumn("n_tok", nTok)
      .groupBy("user_id", "session_id")
      .agg(
        max(when(col("turn_idx") === 1,
          substring_index(col("content"), " ", 1))).as("prompt"),
        (max(when(col("turn_idx") === 1, col("role") === "user"))
          && max_by(col("role") === "assistant", col("turn_idx"))
          && sum(col("repeat")) === 0).as("valid"),
        sum(when(col("role") === "assistant", col("n_tok")).otherwise(0L))
          .as("n_loss_tokens"))
      .select(col("prompt"), col("user_id"), col("session_id"),
        qualityScore(col("valid"), col("n_loss_tokens")).as("score"))
  }

  /** DPO/reward-model training pack: each preference pair joined with
    * BOTH conversations' rendered training strings ([[Instruct.render]])
    * — `(prompt, …, margin, chosen, rejected, chosen_len, rejected_len)`,
    * the literal example a DPO trainer consumes. The pair frame is tiny
    * next to the conversation frame (≤ n−1 pairs per prompt group), so
    * the two renders join AGAINST the pairs — standard fact-trimming:
    * nothing conversation-scale shuffles twice. */
  def dpoPack(turns: DataFrame): DataFrame = {
    val p = pairs(turns)
    val r = Instruct.render(turns)
      .select(col("user_id"), col("session_id"), col("rendered"))
    p.join(r.toDF("c_user", "c_session", "chosen"), Seq("c_user", "c_session"))
      .join(r.toDF("r_user", "r_session", "rejected"), Seq("r_user", "r_session"))
      .select(col("prompt"), col("c_user"), col("c_session"),
        col("r_user"), col("r_session"), col("margin"),
        col("chosen"), col("rejected"),
        length(col("chosen")).cast("long").as("chosen_len"),
        length(col("rejected")).cast("long").as("rejected_len"))
  }

  /** Per-annotator vote on one pair: agree-with-chosen iff the
    * annotator's hash draw lands under `50 + min(margin, 50)` percent —
    * wider margins are easier calls, a zero-margin pair would be a coin
    * flip (which is why [[pairs]] drops them). Deterministic synthetic
    * annotators (hash of annotator id + pair key): the AUDIT arithmetic
    * is the operator; with human labels the vote column is the only
    * thing a deployment swaps. */
  def annotatorVote(annotator: Column, pairKey: Column, margin: Column): Column =
    TextFunctions.portableHash(
      concat(lit("ann"), annotator.cast("string"), lit(":"), pairKey)) % 100 <
      lit(50L) + least(margin, lit(50L))

  /** Vote-reliability readout over [[pairs]] — the calibration-style
    * audit of the annotation channel: pairs bucketed by preference
    * MARGIN, and per bucket the mean vote-for-chosen rate and the
    * majority-correct rate (the chosen side is ground truth by
    * construction — it won the quality ranking), both in exact integer
    * micro-units. A healthy channel shows both rates rising with the
    * margin; a flat curve means the annotators aren't reading the
    * signal. `binEdges` are the ascending margin upper-bounds of all
    * but the last bucket. One explode + one aggregation — no joins. */
  def voteReliability(pairs: DataFrame, nAnnotators: Int = 3,
                      binEdges: Seq[Long] = Seq(5L, 20L, 50L)): DataFrame = {
    require(nAnnotators >= 2 && binEdges == binEdges.sorted,
      "need >= 2 annotators and ascending bin edges")
    val key = concat_ws(":", col("prompt"),
      col("c_user"), col("c_session"), col("r_user"), col("r_session"))
    val bin = binEdges.zipWithIndex.foldRight(lit(binEdges.size.toLong)) {
      case ((edge, i), rest) => when(col("margin") < edge, i.toLong).otherwise(rest)
    }
    val k = nAnnotators.toLong
    pairs
      .select(bin.as("bin"), key.as("pair_key"), col("margin"),
        explode(sequence(lit(0), lit(nAnnotators - 1))).as("ann"))
      .withColumn("vote",
        annotatorVote(col("ann"), col("pair_key"), col("margin")))
      .groupBy("bin", "pair_key")
      .agg(sum(when(col("vote"), 1L).otherwise(0L)).as("v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("v")).as("votes"),
        sum(when(col("v") * 2 >= k + 1, 1L).otherwise(0L)).as("n_majority"))
      .select(col("bin"), col("n_pairs"),
        expr(s"(1000000 * votes) div ($k * n_pairs)").as("vote_micro"),
        expr("(1000000 * n_majority) div n_pairs").as("majority_micro"))
  }

  /** Inter-annotator agreement audit over [[pairs]]: `nAnnotators`
    * deterministic votes per pair, then per-prompt
    * `(n_pairs, n_unanimous, n_majority_chosen, agree_micro)` where
    * `agree_micro` is the pairwise-agreement rate (fraction of
    * annotator PAIRS voting the same way, the standard inter-rater
    * statistic before chance correction) in exact integer micro-units:
    * `(1e6 · Σ agreeing-annotator-pairs) div (C(k,2) · n_pairs)` —
    * integer division on both engines, no float anywhere. */
  def agreement(pairs: DataFrame, nAnnotators: Int = 3): DataFrame = {
    require(nAnnotators >= 2, s"agreement needs >= 2 annotators, got $nAnnotators")
    val key = concat_ws(":", col("prompt"),
      col("c_user"), col("c_session"), col("r_user"), col("r_session"))
    val votes = pairs
      .select(col("prompt"), key.as("pair_key"), col("margin"),
        explode(sequence(lit(0), lit(nAnnotators - 1))).as("ann"))
      .withColumn("vote",
        annotatorVote(col("ann"), col("pair_key"), col("margin")))
    val perPair = votes.groupBy("prompt", "pair_key")
      .agg(sum(when(col("vote"), 1L).otherwise(0L)).as("v"))
    val k = lit(nAnnotators.toLong)
    // TWICE the agreeing annotator pairs among k votes, v of them
    // "chosen": 2·(C(v,2) + C(k−v,2)) = v(v−1) + (k−v)(k−v−1) — kept
    // doubled so every intermediate stays int64 (a bare `/ 2` on long
    // columns is a DOUBLE divide in Spark); the final ratio divides by
    // k(k−1) instead of C(k,2), cancelling the factor exactly
    val agree2 =
      col("v") * (col("v") - 1) + (k - col("v")) * (k - col("v") - 1)
    perPair.groupBy("prompt")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("v") === k || col("v") === 0, 1L).otherwise(0L))
          .as("n_unanimous"),
        sum(when(col("v") * 2 >= k + 1, 1L).otherwise(0L))
          .as("n_majority_chosen"),
        sum(agree2).as("agree_sum2"))
      .select(col("prompt"), col("n_pairs"), col("n_unanimous"),
        col("n_majority_chosen"),
        expr(s"(1000000 * agree_sum2) div ((${nAnnotators.toLong} * " +
          s"${nAnnotators.toLong - 1}) * n_pairs)").as("agree_micro"))
  }
}
