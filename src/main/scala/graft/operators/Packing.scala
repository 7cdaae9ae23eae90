package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity bins (LLM context
  * windows) by greedy first-fit in id order within a shard — the step that
  * turns a filtered corpus into training rows ("pack docs into 8k-token
  * sequences, minimal padding").
  *
  * The recurrence (bin/fill of doc i depends on doc i-1's) is inherently
  * sequential, which no window function expresses — a running sum can't
  * RESET on overflow. The scalable shape: shards are the parallelism unit;
  * `repartition(shard)` + `sortWithinPartitions(shard, id)` makes each
  * shard's docs contiguous and ordered inside a partition, then ONE
  * `mapPartitions` pass walks the recurrence with O(1) state, resetting at
  * shard boundaries. One shuffle total, no per-group collect, memory
  * independent of shard size — this is the documented legitimate use of
  * mapPartitions (a sequential fold Catalyst can't express), mirroring
  * the multimodal codec seam.
  *
  * Semantics (deterministic, engine-replayable — the oracle rebuilds it
  * with a recursive CTE): within a shard, docs in ascending id order; a
  * doc joins the current bin if fill + weight <= capacity, else opens the
  * next bin. A doc heavier than `capacity` gets a bin of its own (the
  * overflow bin closes immediately after). Bins number from 0 per shard.
  */
object Packing {

  def packGreedy(df: DataFrame, idCol: Column, weightCol: Column,
                 shardCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    // null weights become the -1 sentinel so the walk can raise an error
    // naming the offending doc instead of the encoder's opaque NPE (a null
    // text column makes size(tokens) null); negative weights would make
    // `fill + w <= capacity` always true and pack one bin unboundedly.
    df.select(shardCol.cast("long").as("shard"), idCol.cast("long").as("doc_id"),
        coalesce(weightCol.cast("long"), lit(-1L)).as("w"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var shard = Long.MinValue
        var bin = 0L
        var fill = 0L
        var first = true
        it.map { case (s, id, w) =>
          if (w < 0)
            throw new IllegalArgumentException(
              s"packGreedy: null or negative weight for doc_id=$id (shard=$s)")
          if (first || s != shard) { shard = s; bin = 0L; fill = w; first = false }
          else if (fill + w <= capacity) { fill += w }
          else { bin += 1L; fill = w }
          (id, s, bin, w, fill)
        }
      }
      .toDF("doc_id", "shard", "bin", "w", "fill")
  }

  /** Document boundary offsets inside each packed sequence — the
    * attention-mask spans a trainer needs so cross-document positions
    * don't attend to each other (the "sample packing" mask): for every
    * doc, the half-open token range `[seq_start, seq_start + seq_len)`
    * it occupies in its (shard, bin) sequence.
    *
    * Derivation is a pure projection over [[packGreedy]]'s output:
    * `fill` is the bin's running fill AFTER placing the doc, so
    * `seq_start = fill − w` — no window, no extra shuffle; the one
    * mapPartitions walk already computed the recurrence. */
  def packedBoundaries(packed: DataFrame): DataFrame =
    packed.select(col("shard"), col("bin"), col("doc_id"),
      (col("fill") - col("w")).as("seq_start"), col("w").as("seq_len"))

  /** Packing EFFICIENCY audit over [[packGreedy]]'s output — the
    * training-cost readout (every padding token is paid-for compute
    * that trains nothing): per corpus, bins/docs/token totals, padding
    * mass, overflow-bin count (single docs heavier than capacity —
    * their bins legitimately exceed it and contribute no padding), the
    * per-shard bin LOWER BOUND — overflow docs need one bin each
    * regardless of weight, so the bound is Σ_s (overflow_docs_s +
    * ⌈non-overflow-tokens_s / capacity⌉), which stays a true bound
    * (≤ actual bins, so efficiency_ppm ≤ 10⁶) where the naive
    * ⌈tokens/capacity⌉ would overshoot on heavy docs — and two staged
    * micro-ratios: `fill_rate_ppm` (tokens over bins·capacity) and
    * `efficiency_ppm` (lower bound over actual bins; 10⁶ means greedy
    * first-fit matched the bound). All exact integers
    * ([[graft.operators.Sampling.microRatioSql]]).
    *
    * Scale shape: one map-side-combinable (shard, bin) aggregation and
    * one (shard) aggregation — both histogram-sized outputs — then
    * 1-row arithmetic. The corpus-scale walk already happened in
    * [[packGreedy]]; the audit never re-reads text. */
  def fillAudit(packed: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    import graft.operators.Sampling.microRatioSql
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("w").as("_btok"), count(lit(1)).as("_bdocs"))
    val lb = packed.groupBy("shard")
      .agg(sum(when(col("w") <= capacity, col("w")).otherwise(0L)).as("_st"),
        sum(when(col("w") > capacity, 1L).otherwise(0L)).as("_ovf"))
      .agg(sum(col("_ovf") +
          expr(s"(_st + ${capacity - 1}) div $capacity"))
        .cast("long").as("lower_bound_bins"))
    bins.agg(
        count(lit(1)).as("n_bins"),
        sum("_bdocs").cast("long").as("n_docs"),
        sum("_btok").cast("long").as("total_tokens"),
        sum(greatest(lit(0L), lit(capacity) - col("_btok")))
          .cast("long").as("padding_tokens"),
        sum(when(col("_btok") > capacity, 1L).otherwise(0L))
          .cast("long").as("overflow_bins"))
      .crossJoin(lb) // both sides are 1 row
      .withColumn("capacity", lit(capacity))
      .withColumn("fill_rate_ppm",
        when(col("n_bins") > 0L,
          expr(microRatioSql("total_tokens", s"n_bins * $capacity", "div"))))
      .withColumn("efficiency_ppm",
        when(col("n_bins") > 0L,
          expr(microRatioSql("lower_bound_bins", "n_bins", "div"))))
  }
}
