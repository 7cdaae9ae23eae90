package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for training-data release — the step AFTER PII
  * scrubbing ([[graft.functions.TextFunctions.scrubPii]] removes
  * in-content identifiers; these remove METADATA re-identification
  * surface): k-anonymity suppression over quasi-identifier columns,
  * l-diversity auditing of a sensitive attribute, and a bounded
  * generalization ladder that coarsens a numeric quasi-identifier just
  * enough to reach k. Extension tier (the reference pipelines release
  * raw metadata; `/root/reference` has no anonymization surface) —
  * shapes per Sweeney's k-anonymity and Machanavajjhala's l-diversity.
  *
  * Scale discipline shared by all three: quasi-identifier groups are
  * counted with ONE map-side-combinable aggregation and joined back on
  * the same keys (co-partitioned — the join reuses the aggregation's
  * exchange); no windows, so a mega-group (the common case: one huge
  * "default" demographic) cannot funnel through a single task. */
object Privacy {

  /** Per-row quasi-identifier group size: `group_size` appended via
    * count-aggregate + equi-join back on the quasi keys. The building
    * block of [[kAnonymize]]; exposed because release auditing wants the
    * raw sizes (a histogram of group_size IS the re-identification risk
    * profile). */
  def withGroupSize(df: DataFrame, quasi: Seq[Column]): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"_q$i") }
    val keyNames = quasi.indices.map(i => s"_q$i")
    val keyed = df.select(col("*") +: keys: _*)
    val sizes = keyed.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
    keyed.join(sizes, keyNames)
      .drop(keyNames: _*)
  }

  /** k-anonymity by suppression: every row whose quasi-identifier
    * combination is shared by fewer than `k` rows is flagged
    * `suppressed` (and dropped by the release filter the caller
    * applies) — no row in the released set is re-identifiable to
    * better than a k-crowd on those columns. Keeps every row with its
    * verdict: an anonymization pipeline records what it suppressed
    * (the audit-trail discipline of robotsGate / the safety gates). */
  def kAnonymize(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    withGroupSize(df, quasi)
      .withColumn("suppressed", col("group_size") < k)
  }

  /** l-diversity audit: per quasi-identifier group, the number of
    * DISTINCT sensitive values and the `diverse` verdict (>= l) — a
    * k-anonymous group whose sensitive attribute is constant still
    * leaks it (the homogeneity attack l-diversity exists to catch).
    * Group-level output: (quasi..., group_size, n_sensitive, diverse).
    * One aggregation; count_distinct is exact (per-group distinct
    * shuffles the (quasi, sensitive) pairs — 8-byte-hashable values
    * keep the exchange thin at scale). */
  def lDiversity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                 l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    df.select(keys :+ sensitive.as("_s"): _*)
      .groupBy(quasi.indices.map(i => col(s"q$i")): _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(col("_s")).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** Bounded generalization ladder: coarsen a NUMERIC quasi-identifier
    * to the smallest bucket width `baseWidth·2^level` (level 0..
    * `maxLevels`-1) at which the row's bucket holds at least `k` rows;
    * rows no level can cover come back `level = -1` (suppress — the
    * ladder's contract is "generalize where possible, suppress the
    * rest"). Output: every input column plus `(level, bucket,
    * group_size)` — `bucket` is the generalized value to RELEASE in
    * place of the raw one (its floor at the chosen width).
    *
    * Shape: one explode to (row, level) — `maxLevels` is a small
    * constant (a 2^8 widening covers any practical range), so the
    * exploded frame is L·|rows| — then the same count-aggregate +
    * co-partitioned join as [[withGroupSize]] per (level, bucket), and
    * a map-side-combinable min over each row's qualifying levels.
    * Monotonicity note: bucket counts are non-decreasing in level
    * (coarser buckets are unions of finer ones), so "min qualifying
    * level" is well-defined and the released width is minimal. */
  def generalizeUntilK(df: DataFrame, idCol: Column, numCol: Column,
                       baseWidth: Long, maxLevels: Int, k: Long): DataFrame = {
    require(baseWidth >= 1, s"baseWidth must be >= 1, got $baseWidth")
    require(maxLevels >= 1 && maxLevels <= 20,
      s"maxLevels must be in [1, 20], got $maxLevels")
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = df.select(col("*") +: Seq(idCol.as("_gid"),
      numCol.cast("long").as("_gnum")): _*)
    val leveled = keyed.select(col("_gid"), col("_gnum"),
        explode(sequence(lit(0), lit(maxLevels - 1))).as("level"))
      .withColumn("width", lit(baseWidth) * expr("shiftleft(1L, cast(level as int))"))
      .withColumn("bucket", floor(col("_gnum") / col("width")) * col("width"))
    val sizes = leveled.groupBy("level", "bucket")
      .agg(count(lit(1)).as("group_size"))
    val chosen = leveled.join(sizes, Seq("level", "bucket"))
      .filter(col("group_size") >= k)
      .groupBy("_gid")
      .agg(min(struct(col("level"), col("bucket"), col("group_size"))).as("w"))
      .select(col("_gid"), col("w.level").as("level"),
        col("w.bucket").as("bucket"), col("w.group_size").as("group_size"))
    keyed.join(chosen, Seq("_gid"), "left")
      .select(keyed.columns.filterNot(Set("_gid", "_gnum")).map(col) ++ Seq(
        coalesce(col("level"), lit(-1L)).cast("long").as("level"),
        col("bucket"), col("group_size")): _*)
  }
}
