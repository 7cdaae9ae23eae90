package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.portableHash

/** Deterministic sampling operators for training-data pipelines.
  *
  * Two sampling families, by guarantee:
  *  - constant-fraction-in-expectation: `portableHash(id) % D < frac·D` —
  *    a pure filter, zero shuffle, the 100 TB default (bound to the
  *    driver gate by q66_hash_split).
  *  - exact-fraction per stratum: [[stratifiedExact]] below — pays one
  *    narrow shuffle for the guarantee that every stratum contributes
  *    exactly ceil(frac·n) rows (what an eval-set builder or a
  *    mixture-weighted subsample actually needs).
  */
object Sampling {

  /** Exact-fraction stratified sample: within each stratum keep exactly
    * `ceil(frac · n_stratum)` rows — the ones ranking first by an
    * engine-portable hash of the id (deterministic across runs, engines,
    * and partitionings; no RNG state anywhere).
    *
    * Scale shape: the window ranks a PROJECTION of (stratum, id, hash) —
    * three narrow columns — so document bodies never enter the sort
    * shuffle; full rows come back through a left-semi join on the
    * sampled ids (broadcastable whenever frac·n is small). The
    * per-stratum sort is the price of exactness: with few, huge strata
    * the per-stratum task is the bottleneck — callers that can tolerate
    * frac-in-expectation should use the hash-threshold filter (q66
    * shape) instead, which shuffles nothing.
    *
    * CONTRACT: `idCol` must uniquely identify rows. With duplicate ids
    * the "exactly ceil(frac·n)" guarantee is unenforceable — ranking
    * counts (id, hash) occurrences but the semi-join brings back every
    * row sharing a sampled id, so a stratum can over-fill. The join is
    * frame-qualified, so a pre-existing column named like the internal
    * key in `df` cannot capture it. */
  def stratifiedExact(df: DataFrame, stratumCol: Column, idCol: Column,
                      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac=$frac outside [0,1]")
    val keyed = df.select(stratumCol.as("_stratum"), idCol.as("_sid"),
      portableHash(idCol.cast("string")).as("_h"))
    val part = Window.partitionBy(col("_stratum"))
    // rank and stratum size share one exchange (same partitioning)
    val picked = keyed
      .withColumn("_rk", row_number().over(part.orderBy(col("_h"), col("_sid"))))
      .withColumn("_n", count(lit(1)).over(part))
      .filter(col("_rk") <= ceil(lit(frac) * col("_n")))
      .select(col("_sid").as("_graft_picked_sid"))
    df.join(picked, idCol === picked("_graft_picked_sid"), "left_semi")
  }
}
