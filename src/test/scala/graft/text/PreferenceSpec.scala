package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic turn frame in [[Instruct.turns]]'s shape. Conversation
    * scores (valid·100000 + loss tokens) are controlled through role
    * layout and content token counts. */
  private def turnFrame(rows: Seq[(Long, Long, Long, String, String)]): DataFrame =
    rows.toDF("user_id", "session_id", "turn_idx", "role", "content")

  // prompt = first token of the first turn's content
  private val turns = turnFrame(Seq(
    // prompt "ask": three conversations, scores 100002 / 100004 / 2
    (1L, 1L, 1L, "user", "ask one"), (1L, 1L, 2L, "assistant", "short reply"),
    (2L, 1L, 1L, "user", "ask two"), (2L, 1L, 2L, "assistant", "a much longer reply"),
    (3L, 1L, 1L, "assistant", "ask spam"), (3L, 1L, 2L, "assistant", "rep reply"),
    // prompt "task": two conversations with IDENTICAL scores (tie)
    (4L, 1L, 1L, "user", "task a"), (4L, 1L, 2L, "assistant", "same len"),
    (5L, 1L, 1L, "user", "task b"), (5L, 1L, 2L, "assistant", "also len")))

  test("pairs: adjacent ranking within a prompt, strict margins, ties dropped") {
    val got = Preference.pairs(turns)
      .select("prompt", "c_user", "r_user", "margin")
      .as[(String, Long, Long, Long)].collect().toSet
    // "ask" ranking: u2 (valid, 4 loss toks = 100004) > u1 (valid, 2 =
    // 100002) > u3 (invalid: starts assistant + repeat; 4 = 4).
    // Adjacent pairs: (u2 > u1, margin 2), (u1 > u3, margin 99998).
    // "task": exact tie -> NO pair.
    assert(got == Set(("ask", 2L, 1L, 2L), ("ask", 1L, 3L, 100002L - 4L)),
      s"got $got")
  }

  test("pairs: chain covers the ranking without all-pairs blowup") {
    // n conversations on one prompt with distinct scores -> exactly n-1 pairs
    val many = turnFrame((1L to 6L).flatMap { u =>
      val reply = (1L to u).map(i => s"w$i").mkString(" ") // u loss tokens
      Seq((u, 1L, 1L, "user", "go now"), (u, 1L, 2L, "assistant", reply))
    })
    val got = Preference.pairs(many).collect()
    assert(got.length == 5)
    assert(got.forall(_.getAs[Long]("margin") == 1L))
  }

  test("pairsRangePartitioned: identical pairs to the windowed form, no prompt window") {
    // the mega-prompt fixture IS this degenerate shape: 2 prompts over
    // many conversations — exactly what the range-partitioned form is for
    val many = turnFrame((1L to 9L).flatMap { u =>
      val prompt = if (u % 2 == 0) "go now" else "ask it"
      val reply = (1L to u).map(i => s"w$i").mkString(" ")
      Seq((u, 1L, 1L, "user", prompt), (u, 1L, 2L, "assistant", reply))
    }) // plus the tie/invalid fixture from `turns`
    for (frame <- Seq(turns, many); parts <- Seq(2, 7)) {
      val windowed = Preference.pairs(frame)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val ranged = Preference.pairsRangePartitioned(frame, partitions = parts)
        .select("prompt", "c_user", "c_session", "r_user", "r_session", "margin")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(ranged == windowed, s"parts=$parts: $ranged vs $windowed")
    }
    // the scale contract itself: no window partitioned by prompt anywhere
    val plan = Preference.pairsRangePartitioned(turns, partitions = 2)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(prompt"),
      s"prompt-keyed window must not appear:\n$plan")
  }

  test("bestOf: per-prompt argmax with pairs' tie order, rendered string attached, no prompt window") {
    val got = Preference.bestOf(turns)
      .select("prompt", "user_id", "score", "best_response")
      .as[(String, Long, Long, String)].collect()
      .map { case (p, u, s, r) => p -> ((u, s, r)) }.toMap
    // "ask": u2 wins (100004); "task": exact tie 100002 -> smallest user (u4)
    assert(got("ask")._1 == 2L && got("ask")._2 == 100004L, got.toString)
    assert(got("task")._1 == 4L, s"tie must break to the smallest user: $got")
    assert(got("ask")._3.startsWith("<|user|>ask two<|end|>"),
      s"winner's own render must be attached: ${got("ask")._3}")
    val plan = Preference.bestOf(turns).queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(prompt"),
      s"selection must be an aggregation, not a prompt window:\n$plan")
  }

  test("bestOf: the broadcast hint is size-guarded like robotsGate") {
    // under the threshold the winner frame carries the hint; over it
    // (threshold 0 here) the join must fall back to a plain equi-join —
    // prompts are normally high-cardinality, so an unconditional hint
    // on a corpus-scale winner frame would OOM the driver at 100×
    val small = Preference.bestOf(turns).queryExecution
      .executedPlan.toString
    assert(small.contains("BroadcastHashJoin"),
      s"under-threshold winner frame must broadcast:\n$small")
    val big = Preference.bestOf(turns, maxBroadcastWinners = 0L)
    val bigPlan = big.queryExecution.optimizedPlan.toString
    assert(!bigPlan.toLowerCase.contains("broadcast"),
      s"over-threshold winner frame must not be hinted:\n$bigPlan")
    // and the guard is invisible in the output
    val a = Preference.bestOf(turns)
      .select("prompt", "user_id", "session_id", "score")
      .as[(String, Long, Long, Long)].collect().toSet
    val b = big.select("prompt", "user_id", "session_id", "score")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b, s"$a vs $b")
  }

  test("agreement: vote counts, unanimity/majority bookkeeping, exact micro ratio") {
    val pairs = Preference.pairs(turns)
    val got = Preference.agreement(pairs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == Set("ask"), s"only the non-tied prompt has pairs: $got")
    val (nPairs, nUnan, nMaj, micro) = got("ask")
    assert(nPairs == 2)
    assert(nUnan <= nPairs && nMaj <= nPairs)
    // pairwise-agreement rate over 3 annotators: per pair, agreeing
    // annotator-pairs ∈ {1 (2-1 split), 3 (unanimous)} of 3 — so the
    // micro ratio is bounded in [1/3, 1] and exactly integer-derived
    assert(micro >= 333333L && micro <= 1000000L, s"micro $micro")
    // exact recomputation from the vote counts themselves
    val v = pairs
      .select(col("prompt"),
        concat_ws(":", col("prompt"), col("c_user"), col("c_session"),
          col("r_user"), col("r_session")).as("k"), col("margin"),
        explode(sequence(lit(0), lit(2))).as("ann"))
      .withColumn("vote",
        Preference.annotatorVote(col("ann"), col("k"), col("margin")))
      .groupBy("k").agg(sum(when(col("vote"), 1L).otherwise(0L)).as("v"))
      .as[(String, Long)].collect().toMap
    assert(v.values.forall(x => x >= 0 && x <= 3))
    val agree2 = v.values.map(x => x * (x - 1) + (3 - x) * (2 - x)).sum
    assert(micro == 1000000L * agree2 / (6 * nPairs))
    assert(nUnan == v.values.count(x => x == 0 || x == 3))
    assert(nMaj == v.values.count(_ >= 2))
  }

  test("dpoPack: pairs carry both rendered conversations with exact lengths") {
    val got = Preference.dpoPack(turns)
      .select("c_user", "chosen", "rejected", "chosen_len", "rejected_len")
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L), "one pack row per kept pair")
    // u2 > u1: chosen is u2's render, rejected u1's — template layout
    // identical to Instruct.render
    val (_, chosen, rejected, cLen, rLen) = got(2L)
    assert(chosen ==
      "<|user|>ask two<|end|><|assistant|>a much longer reply<|end|>")
    assert(rejected ==
      "<|user|>ask one<|end|><|assistant|>short reply<|end|>")
    assert(cLen == chosen.length && rLen == rejected.length)
  }

  test("voteReliability: binning respects edges; rates are exact integer ratios in range") {
    val pairs = Seq(
      ("p", 1L, 1L, 2L, 1L, 3L),    // bin 0 (margin < 5)
      ("p", 3L, 1L, 4L, 1L, 30L),   // bin 2 ([20, 50))
      ("p", 5L, 1L, 6L, 1L, 80L),   // bin 3 (>= 50)
      ("p", 7L, 1L, 8L, 1L, 99L))   // bin 3
      .toDF("prompt", "c_user", "c_session", "r_user", "r_session", "margin")
    val got = Preference.voteReliability(pairs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(0L, 2L, 3L))
    assert(got(3L)._1 == 2L, "two pairs land in the top bin")
    // margin >= 50 forces the vote threshold to 100%: every annotator
    // votes chosen, so both rates are exactly 1e6
    assert(got(3L) == ((2L, 1000000L, 1000000L)), got.toString)
    got.values.foreach { case (_, vm, mm) =>
      assert(vm >= 0 && vm <= 1000000 && mm >= 0 && mm <= 1000000)
    }
  }

  test("agreement: a wider margin never lowers a single annotator's chosen-vote chance") {
    // vote threshold is 50 + min(margin, 50): for a FIXED hash draw,
    // raising the margin can only flip votes toward chosen
    val k = lit("prompt:1:1:2:2")
    val votes = spark.range(0, 3).select(
      Preference.annotatorVote(col("id"), k, lit(1L)).as("narrow"),
      Preference.annotatorVote(col("id"), k, lit(60L)).as("wide"))
      .as[(Boolean, Boolean)].collect()
    votes.foreach { case (narrow, wide) =>
      assert(!narrow || wide, "vote flipped away from chosen as margin grew")
    }
  }
}
