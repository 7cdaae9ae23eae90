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
}
