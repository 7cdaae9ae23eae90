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

  /** t-closeness audit (Li/Li/Venkatasubramanian): per quasi-identifier
    * group, the total-variation distance between the group's sensitive-
    * value distribution and the corpus-wide one — the skewness attack a
    * k-anonymous, l-diverse release still leaks to (a group can be
    * diverse yet concentrated on values rare globally). Group-level
    * output `(q0.., group_size, tvd_num, close)` where the distance is
    * carried as the INTEGER numerator `tvd_num = Σ_v |cgv·N − cv·ng|`
    * (+ the absent-value mass `(N − Σ_present cv)·ng`), so
    * `TVD = tvd_num / (2·ng·N)` and the verdict `TVD ≤ tNum/tDen` is an
    * exact integer comparison — no float summation order to drift
    * between engines or partitionings.
    *
    * Shape: global value histogram (|values| rows — broadcast) + the
    * (quasi, value) histogram + per-group sizes; two map-side-combinable
    * aggregations and one broadcast join, no window. Long-arithmetic
    * bound: `cv·ng ≤ N²` must fit a signed 64-bit, i.e. N < ~3·10⁹ rows
    * per audited release — shard the audit by corpus partition beyond
    * that (each shard's release is audited against its own global). */
  def tCloseness(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                 tNum: Long, tDen: Long,
                 maxBroadcastValues: Long = 1L << 20,
                 scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(tDen >= 1 && tNum >= 0 && tNum <= tDen,
      s"t must be a fraction in [0,1], got $tNum/$tDen")
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    val keyNames = quasi.indices.map(i => s"q$i")
    val keyed = df.select(keys :+ sensitive.as("_s"): _*)
    // ONE corpus scan total: everything — the global value histogram,
    // the per-group sizes, the corpus total, the join — derives from
    // the persisted (quasi, value) histogram, whose build is the single
    // map-side-combinable pass over the corpus. (The previous shape
    // paid an extra scan: the size-guard count materialized a global
    // histogram the join branch then re-derived from scratch — the
    // third instance of the no-exchange-reuse-across-agg-shapes trap.)
    val gv = scope.persist(keyed
      .groupBy(keyNames.map(col) :+ col("_s"): _*)
      .agg(count(lit(1)).as("_cgv")))
    // |values| rows — small for any sensible (categorical/bucketed)
    // sensitive attribute, but a continuous column would make this
    // corpus-scale, so the hint is size-guarded like robotsGate: count
    // first (materializes the gv cache, so this is the one corpus
    // scan), broadcast only under the threshold, else let the join
    // shuffle on _s (AQE may still elect broadcast from stats).
    val globalRaw = gv.groupBy("_s").agg(sum("_cgv").cast("long").as("_cv"))
    val global =
      if (globalRaw.count() <= maxBroadcastValues) broadcast(globalRaw)
      else globalRaw
    val total = globalRaw.agg(sum("_cv").cast("long").as("_n")) // 1 row
    val sizes = gv.groupBy(keyNames.map(col): _*)
      .agg(sum("_cgv").cast("long").as("_ng"))
    gv.join(global, "_s")
      .join(sizes, keyNames)
      .crossJoin(broadcast(total))
      .groupBy(keyNames.map(col): _*)
      .agg(
        max("_ng").as("group_size"),
        (sum(abs(col("_cgv") * col("_n") - col("_cv") * col("_ng"))) +
          (max("_n") - sum("_cv")) * max("_ng")).cast("long").as("tvd_num"),
        max("_n").as("_N"))
      .withColumn("close",
        lit(tDen) * col("tvd_num") <= lit(2L * tNum) * col("group_size") * col("_N"))
      .drop("_N")
  }

  /** Inverse-CDF thresholds for the two-sided geometric ("discrete
    * Laplace") mechanism at 24-bit hash resolution: entry i is
    * `floor(CDF(i − maxShift) · 2²⁴)` for noise values
    * `−maxShift .. maxShift−1`; a 24-bit uniform `u` maps to the first
    * i with `u < thresholds(i)` (else `maxShift`). P(K=k) =
    * ((1−p)/(1+p))·p^|k| with p = e^(−eps) — the standard ε-DP count
    * mechanism over integers. Computed ONCE on the driver and embedded
    * as literals in BOTH the Spark plan and the generated DuckDB twin,
    * so no runtime float crosses an engine boundary. */
  def geometricThresholds(eps: Double, maxShift: Int): Seq[Long] = {
    require(eps > 0, s"eps must be > 0, got $eps")
    require(maxShift >= 1 && maxShift <= 64,
      s"maxShift must be in [1, 64], got $maxShift")
    val p = math.exp(-eps)
    val p0 = (1 - p) / (1 + p)
    var cdf = 0.0
    (-maxShift until maxShift).map { k =>
      cdf += p0 * math.pow(p, math.abs(k))
      math.min(math.floor(cdf * (1L << 24)).toLong, (1L << 24) - 1)
    }
  }

  /** ε-DP noisy count release: per quasi-identifier group, the true
    * count perturbed by two-sided-geometric noise — the discrete
    * Laplace mechanism (sensitivity-1 count queries, ε-differential
    * privacy), made DETERMINISTIC and engine-portable by deriving the
    * noise from the first 24 bits of `md5(seed|q0|q1|…)` through the
    * precomputed inverse-CDF table ([[geometricThresholds]]): same
    * seed + keys → same noise on any engine, any partitioning — the
    * reproducibility a release audit requires (true randomness would
    * make the release unverifiable; rotate `seed` per release to
    * re-randomize). `released = max(0, count + noise)` (clamping is
    * post-processing — DP survives it). Output keeps the true
    * `group_size` alongside: this operator's product is the release
    * AUDIT artifact; the public release projects `(q.., released)`.
    *
    * Shape: one map-side-combinable count aggregation, then a pure
    * per-row projection (hash → table lookup via a literal when-chain —
    * codegen'd, zero shuffle beyond the count's). Quasi values enter
    * the hash through a string render (`concat_ws`) — use string or
    * integer keys; float keys render differently across engines
    * ("1.0" vs "1") and would silently de-synchronize an external
    * replay of the release. */
  def dpNoisyCounts(df: DataFrame, quasi: Seq[Column], eps: Double,
                    seed: String, maxShift: Int = 40): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    val keyNames = quasi.indices.map(i => s"q$i")
    val counts = df.select(keys: _*)
      .groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
    // materialize the 24-bit uniform ONCE before the when-chain — a
    // val-bound Column would splice the md5→conv subtree into every
    // one of the 2·maxShift branch conditions (the q124-family
    // expression-splicing hazard), bloating the plan ~80×
    val u = col("_u")
    val noise = tableNoiseExpr(u, eps, maxShift)
    counts
      .withColumn("_u", conv(substring(md5(
          concat_ws("|", lit(seed) +: keyNames.map(col): _*)), 1, 6), 16, 10)
        .cast("long"))
      .withColumn("noise", noise)
      .withColumn("released", greatest(lit(0L), col("group_size") + col("noise")))
      .drop("_u")
  }

  /** Table-mechanism noise: literal when-chain over the 24-bit uniform
    * (the [[dpNoisyCounts]] expression — shared with [[dpNoisyAvg]]'s
    * count half so the two can't drift). */
  private def tableNoiseExpr(u: Column, eps: Double, maxShift: Int): Column = {
    val thresholds = geometricThresholds(eps, maxShift)
    thresholds.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (t, i)) =>
        val k = lit((i - maxShift).toLong)
        Some(acc.fold(when(u < lit(t), k))(_.when(u < lit(t), k)))
    }.get.otherwise(lit(maxShift.toLong))
  }

  /** Closed-form two-sided-geometric inverse CDF at parameter p (the
    * [[dpNoisySums]] expression — shared with [[dpNoisyAvg]]'s sum
    * half). `u` must be strictly inside (0, 1). */
  private def closedFormNoiseExpr(u: Column, p: Double): Column =
    when(u < lit(p / (1 + p)),
      lit(1.0) - ceil(log(u * lit(1 + p)) / lit(math.log(p))))
    .otherwise(floor(log((lit(1.0) - u) * lit(1 + p)) / lit(math.log(p))))

  /** ε-DP noisy SUM release: per quasi-identifier group, the sum of a
    * per-row value CLIPPED to [clipLo, clipHi], perturbed by
    * discrete-Laplace noise of parameter ε/Δ where Δ = max(|clipLo|,
    * |clipHi|) — the bounded-contribution sum mechanism. Clipping is
    * what makes Δ the sensitivity: no single row can move the sum by
    * more than Δ. The one-row-per-individual contract is the caller's
    * (pre-aggregate per individual first when it doesn't hold — the
    * same caveat every production DP-sum carries).
    *
    * Deterministic and engine-portable like [[dpNoisyCounts]] (same
    * md5(seed|keys) 24-bit uniform), but the noise comes from the
    * CLOSED-FORM two-sided-geometric inverse CDF instead of the
    * precomputed table — a table for sums would need ~Δ/ε·branches
    * (thousands at realistic Δ), far past what a when-chain or codegen
    * method tolerates. With p = e^(−ε/Δ), u ∈ (0,1):
    *
    *   u < p/(1+p):   noise = 1 − ⌈ln(u·(1+p)) / ln p⌉   (negative tail)
    *   otherwise:     noise = ⌊ln((1−u)·(1+p)) / ln p⌋   (zero/positive)
    *
    * p, 1+p, p/(1+p), ln p all fold DRIVER-side and print into the SQL
    * twin, so runtime float work is one multiply + ln + divide +
    * floor/ceil per group — both engines evaluate the identical tree
    * (u = (u24+0.5)/2²⁴ is strictly inside (0,1): neither ln argument
    * can reach 0). `released` clamps at 0 when clipLo ≥ 0 — clamping
    * is post-processing, DP survives it. Output keeps the true
    * `group_sum` alongside: the release AUDIT artifact; the public
    * release projects `(q.., released)`. */
  def dpNoisySums(df: DataFrame, quasi: Seq[Column], value: Column,
                  clipLo: Long, clipHi: Long, eps: Double,
                  seed: String): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(clipHi > clipLo, s"need clipHi > clipLo, got [$clipLo, $clipHi]")
    require(eps > 0, s"eps must be > 0, got $eps")
    val delta = math.max(math.abs(clipLo), math.abs(clipHi)).toDouble
    require(delta > 0, "clip bounds cannot both be 0")
    val p = math.exp(-eps / delta)
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    val keyNames = quasi.indices.map(i => s"q$i")
    val clipped = greatest(lit(clipLo), least(lit(clipHi), value.cast("long")))
    val sums = df.select(keys :+ clipped.as("_v"): _*)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col("_v")).as("group_sum"))
    // _u24 materialized once (the dpNoisyCounts expression-splicing
    // discipline); u is cheap arithmetic over the materialized column
    val u = (col("_u24").cast("double") + lit(0.5)) / lit(16777216.0)
    val noise = closedFormNoiseExpr(u, p)
    val released =
      if (clipLo >= 0) greatest(lit(0L), col("group_sum") + col("noise"))
      else col("group_sum") + col("noise")
    sums
      .withColumn("_u24", conv(substring(md5(
          concat_ws("|", lit(seed) +: keyNames.map(col): _*)), 1, 6), 16, 10)
        .cast("long"))
      .withColumn("noise", noise.cast("long"))
      .withColumn("released", released)
      .drop("_u24")
  }

  /** ε-DP noisy MEAN release — the third of the DP release trio: the
    * budget splits ε/2 to the count (table mechanism, sensitivity 1)
    * and ε/2 to the clipped sum (closed-form mechanism, sensitivity
    * Δ = clipHi), both released, and the mean derived as the
    * post-processing ratio released_sum / max(1, released_count) —
    * sequential composition gives the pair (and hence the ratio) ε-DP.
    * The two uniforms are DOMAIN-SEPARATED (`seed|count|keys` vs
    * `seed|sum|keys`): one shared uniform would correlate the noises
    * and leak through the ratio.
    *
    * One aggregation computes both statistics (no second corpus pass);
    * the mean is the exact staged-integer micro-ratio
    * ([[Sampling.microRatioSql]] — overflow-safe to quadrillions, and
    * engine-portable only because every operand is non-negative:
    * Spark's `div` truncates toward zero while DuckDB's `//` floors,
    * which diverge on negatives, hence the clipLo ≥ 0 requirement).
    * Output keeps the true (group_size, group_sum) alongside — the
    * audit artifact; the public release projects
    * `(q.., released_count, released_sum, mean_micro)`. */
  def dpNoisyAvg(df: DataFrame, quasi: Seq[Column], value: Column,
                 clipLo: Long, clipHi: Long, eps: Double, seed: String,
                 maxShift: Int = 40): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(clipLo >= 0, s"dpNoisyAvg needs clipLo >= 0 (staged-integer " +
      s"ratio portability: div vs // diverge on negatives), got $clipLo")
    require(clipHi > clipLo, s"need clipHi > clipLo, got [$clipLo, $clipHi]")
    require(eps > 0, s"eps must be > 0, got $eps")
    val epsHalf = eps / 2
    val p = math.exp(-epsHalf / clipHi.toDouble)
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    val keyNames = quasi.indices.map(i => s"q$i")
    val clipped = greatest(lit(clipLo), least(lit(clipHi), value.cast("long")))
    val agg = df.select(keys :+ clipped.as("_v"): _*)
      .groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("group_size"), sum(col("_v")).as("group_sum"))
    def u24(tag: String): Column = conv(substring(md5(
        concat_ws("|", lit(seed) +: lit(tag) +: keyNames.map(col): _*)),
      1, 6), 16, 10).cast("long")
    val uS = (col("_us").cast("double") + lit(0.5)) / lit(16777216.0)
    agg
      .withColumn("_uc", u24("count"))
      .withColumn("_us", u24("sum"))
      .withColumn("released_count",
        greatest(lit(0L), col("group_size") + tableNoiseExpr(col("_uc"), epsHalf, maxShift)))
      .withColumn("released_sum",
        greatest(lit(0L), col("group_sum") + closedFormNoiseExpr(uS, p).cast("long")))
      .withColumn("mean_micro", expr(Sampling.microRatioSql(
        "released_sum", "greatest(1, released_count)", "div")))
      .drop("_uc", "_us")
  }

  // ------------------------------------------- contribution bounding

  /** Bounded-contribution projection: keep each individual's first `k`
    * rows under a caller-supplied DETERMINISTIC total order — the step
    * that turns row-level DP into USER-level DP. Every mechanism above
    * is calibrated to "one ROW changes"; a real individual contributes
    * many rows (one user, thousands of events), so a row-level release
    * over raw data protects far less than its ε claims. Capping
    * contributions at `k` bounds any one individual's influence on a
    * downstream count at k — group privacy then prices the release at
    * k·ε_row, which [[dpNoisyCountsByUser]] spends explicitly.
    *
    * `order` must be a deterministic total order WITHIN each user's
    * rows (ties broken by every caller-relevant column — pass e.g.
    * `(ts, event_id)`); a non-total order would make the kept set
    * partitioning-dependent and the release unreplayable. One
    * hash-partition-by-user window (rank ≤ k is WindowGroupLimit'd
    * map-side, so the exchange carries ≤ k rows per user per
    * partition), no other shuffle. */
  def boundContributions(df: DataFrame, userCol: Column, k: Int,
                         order: Seq[Column]): DataFrame = {
    require(k >= 1, s"contribution bound must be >= 1, got $k")
    require(order.nonEmpty, "need a deterministic within-user order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(order: _*)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** USER-level ε-DP noisy counts: [[boundContributions]] at `k`, then
    * [[dpNoisyCounts]] with the per-row budget ε/k — by group privacy,
    * the composite is ε-DP with respect to changing ONE USER's entire
    * contribution (≤ k rows, each row's change costing ε/k). This is
    * the release a privacy review actually demands for event-shaped
    * tables ([[dpNoisyCounts]]'s row-level contract is only right when
    * rows ARE individuals); ledger it with [[spendOfUserCounts]],
    * which records sensitivity k so the audit shows the user-level
    * price, not the per-row one. */
  def dpNoisyCountsByUser(df: DataFrame, userCol: Column,
                          order: Seq[Column], k: Int,
                          quasi: Seq[Column], eps: Double, seed: String,
                          maxShift: Int = 40): DataFrame = {
    require(eps > 0, s"eps must be > 0, got $eps")
    dpNoisyCounts(boundContributions(df, userCol, k, order), quasi,
      eps / k, seed, maxShift)
  }

  /** USER-level ε-DP noisy sums: pre-aggregate the value per
    * (user, group) — after which rows ARE individuals, which is exactly
    * the one-row-per-individual contract [[dpNoisySums]] documents —
    * then clip each user's per-group TOTAL to [clipLo, clipHi] and
    * noise at ε/Δ. One user's entire contribution to a released group
    * moves that group's sum by at most Δ = max(|lo|, |hi|), so the
    * release is ε-DP per user WITH RESPECT TO EACH GROUP. A user
    * contributing to g groups is covered by g·ε under sequential
    * composition — bound g first with [[boundContributions]] over the
    * user's DISTINCT group keys when strict whole-release user-level ε
    * is required (the same caveat every production user-level sum
    * carries). Ledger with [[spendOfUserSums]], stating the g bound —
    * the ledger row charges g·ε and names the per-group scope.
    *
    * Shape: two map-side-combinable aggregations (corpus → per-user
    * partials → group sums); the clip between them is a projection. */
  def dpNoisySumsByUser(df: DataFrame, userCol: Column, quasi: Seq[Column],
                        value: Column, clipLo: Long, clipHi: Long,
                        eps: Double, seed: String): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    val keyNames = quasi.indices.map(i => s"q$i")
    val perUser = df
      .select((userCol.as("_user") +: keys) :+ value.cast("long").as("_v"): _*)
      .groupBy((col("_user") +: keyNames.map(col)): _*)
      .agg(sum("_v").as("_uv"))
    dpNoisySums(perUser, keyNames.map(col), col("_uv"),
      clipLo, clipHi, eps, seed)
  }

  // ------------------------------------------------------ budget ledger

  /** One mechanism invocation in a DP release pipeline — a budget-ledger
    * row. ε is carried as MICRO-ε (`round(ε·10⁶)`): the ledger and its
    * audit are exact integer arithmetic end to end, so the artifact
    * replays identically on any engine (the drift-family ppm
    * discipline). `seedDomain` is the FULL domain string the mechanism
    * hashed under (seed plus any domain-separation tag — e.g.
    * [[dpNoisyAvg]]'s `seed|count` / `seed|sum` halves), because seed
    * REUSE across releases is itself a privacy defect the audit must
    * see: two releases noised from the same uniform are correlated, and
    * their difference cancels the noise. `nGroups` records how many
    * rows the release actually published. */
  final case class DpSpend(release: String, tableName: String,
                           mechanism: String, epsMicro: Long,
                           sensitivity: Long, seedDomain: String,
                           nGroups: Long)

  private def microEps(eps: Double): Long = math.round(eps * 1e6)

  /** Ledger rows for a [[dpNoisyCounts]] release (sensitivity 1). Kept
    * adjacent to the mechanism so the accounting can't drift from the
    * implementation; `PrivacySpec` pins the correspondence. */
  def spendOfCounts(release: String, table: String, eps: Double,
                    seed: String, nGroups: Long): Seq[DpSpend] =
    Seq(DpSpend(release, table, "dp_noisy_counts", microEps(eps), 1L,
      seed, nGroups))

  /** Ledger rows for a [[dpNoisyCountsByUser]] release: ONE row at the
    * USER-level price — mechanism ε_row = ε/k over sensitivity-k
    * contributions composes to ε per user, which is what the ledger
    * must charge (recording ε/k at sensitivity 1 would understate the
    * spend k-fold). */
  def spendOfUserCounts(release: String, table: String, eps: Double,
                        k: Int, seed: String, nGroups: Long): Seq[DpSpend] =
    Seq(DpSpend(release, table, s"dp_noisy_counts.user_k$k",
      microEps(eps), k.toLong, seed, nGroups))

  /** Ledger rows for a [[dpNoisySumsByUser]] release: same Δ algebra as
    * [[spendOfSums]] (the clip bound IS the sensitivity) but the
    * mechanism's guarantee is PER-GROUP (a user contributing to g
    * groups is only covered by g·ε under sequential composition), so
    * the ledger row must carry that scope — an auditor consuming
    * ledger rows alone must not read a whole-release user-level ε
    * where none was bought. The caller states the contribution bound
    * `maxGroupsPerUser` (enforce it upstream with
    * [[boundContributions]] over the user's DISTINCT group keys); the
    * row then charges the composed price `g·ε` under the mechanism
    * name `dp_noisy_sums.user_g<g>`, making the scope machine-readable
    * in the artifact itself, not just in this scaladoc. */
  def spendOfUserSums(release: String, table: String, eps: Double,
                      clipLo: Long, clipHi: Long, seed: String,
                      nGroups: Long, maxGroupsPerUser: Int): Seq[DpSpend] = {
    require(maxGroupsPerUser >= 1,
      s"maxGroupsPerUser must be >= 1, got $maxGroupsPerUser")
    Seq(DpSpend(release, table, s"dp_noisy_sums.user_g$maxGroupsPerUser",
      microEps(eps) * maxGroupsPerUser,
      math.max(math.abs(clipLo), math.abs(clipHi)), seed, nGroups))
  }

  /** Ledger rows for a [[dpNoisySums]] release (Δ = max(|lo|, |hi|)). */
  def spendOfSums(release: String, table: String, eps: Double,
                  clipLo: Long, clipHi: Long, seed: String,
                  nGroups: Long): Seq[DpSpend] =
    Seq(DpSpend(release, table, "dp_noisy_sums", microEps(eps),
      math.max(math.abs(clipLo), math.abs(clipHi)), seed, nGroups))

  /** Ledger rows for a [[dpNoisyAvg]] release: TWO mechanism rows — the
    * ε/2 count half (sensitivity 1, domain `seed|count`) and the ε/2
    * clipped-sum half (sensitivity `clipHi`, domain `seed|sum`) —
    * mirroring exactly how the mechanism splits its budget, so the
    * ledger total equals the real spend under sequential composition. */
  def spendOfAvg(release: String, table: String, eps: Double,
                 clipHi: Long, seed: String, nGroups: Long): Seq[DpSpend] =
    Seq(
      DpSpend(release, table, "dp_noisy_mean.count", microEps(eps / 2), 1L,
        s"$seed|count", nGroups),
      DpSpend(release, table, "dp_noisy_mean.sum", microEps(eps / 2),
        clipHi, s"$seed|sum", nGroups))

  /** The DP budget LEDGER: one row per mechanism invocation. The spend
    * list is driver-side release telemetry (a pipeline runs a handful
    * of releases), so materializing it as a frame is exact and free —
    * the frame exists so the audit composes with the rest of the
    * release artifacts (joins against [[graft.operators.Release]] cards,
    * streaming append sinks, …). */
  def dpLedger(spark: org.apache.spark.sql.SparkSession,
               spends: Seq[DpSpend]): DataFrame = {
    require(spends.nonEmpty, "an empty ledger audits nothing")
    spark.createDataFrame(spends).toDF(
      "release", "table_name", "mechanism", "eps_micro", "sensitivity",
      "seed_domain", "n_groups")
  }

  /** Composed-budget AUDIT over a [[dpLedger]] frame: per released
    * table, the cumulative ε spend under SIMPLE SEQUENTIAL COMPOSITION
    * (Σ εᵢ — every mechanism run against the same records adds; the
    * conservative reading a release review wants) against a micro-ε
    * budget, plus the seed-hygiene flag: `seed_reused` fires when two
    * mechanism invocations shared a seed domain (correlated noise — the
    * difference of two such releases cancels the perturbation). All
    * columns are exact integers; telemetry-sized. */
  def dpBudgetAudit(ledger: DataFrame, budgetMicroEps: Long): DataFrame = {
    require(budgetMicroEps > 0, s"budget must be positive, got $budgetMicroEps")
    ledger.groupBy("table_name")
      .agg(countDistinct("release").as("n_releases"),
        count(lit(1)).as("n_mechanisms"),
        sum("eps_micro").as("spent_eps_micro"),
        countDistinct("seed_domain").as("n_seed_domains"),
        sum("n_groups").as("n_groups_released"))
      .withColumn("budget_eps_micro", lit(budgetMicroEps))
      .withColumn("remaining_eps_micro",
        col("budget_eps_micro") - col("spent_eps_micro"))
      .withColumn("over_budget",
        col("spent_eps_micro") > col("budget_eps_micro"))
      .withColumn("seed_reused",
        col("n_mechanisms") > col("n_seed_domains"))
  }

  /** Keyed pseudonymization of identifier columns: each named column is
    * replaced IN PLACE by `sha2-256(secret | column-name | value)` —
    * deterministic under one secret (referential integrity survives:
    * equal ids pseudonymize equally, so joins/groupBys on the
    * pseudonym behave exactly as on the raw id), unlinkable across
    * secrets (rotate per release), and domain-separated by column name
    * (the same raw value in two different columns yields different
    * pseudonyms — no accidental cross-column linkage). The release
    * step between content scrubbing ([[graft.functions.TextFunctions]]
    * scrubPii) and the metadata audits above.
    *
    * Zero shuffle — a pure per-row projection, whole-stage codegen'd.
    * Security note: this is PSEUDONYMIZATION (reversible by whoever
    * holds the secret via re-computation, brute-forceable for
    * low-entropy id spaces) — not anonymization; pair with the k/l/t
    * audits before treating a release as de-identified. The keyed-hash
    * form is `H(secret|…)` rather than HMAC because both engines must
    * compute it portably; length-extension is immaterial here (no
    * authentication claim) and HMAC would not slow id-space
    * enumeration either. */
  def pseudonymize(df: DataFrame, cols: Seq[String], secret: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        sha2(concat_ws("|", lit(secret), lit(c), col(c).cast("string")), 256))
    }
  }

  /** Erasure (right-to-be-forgotten): drop every row whose `key` appears
    * in `requests` (single-column frame of keys to erase; deduplicated
    * here, so replayed/duplicate requests are idempotent). A left-anti
    * equi-join — shuffles on the key, and AQE broadcasts the request
    * side when it's small (the common case: requests ≪ corpus). Erasure
    * COMMUTES with any per-key derivation (filter-then-derive ==
    * derive-then-filter for user-keyed aggregates — spec-pinned), which
    * is what makes cascading through materialized derived tables sound. */
  def eraseByKey(df: DataFrame, key: Column, requests: DataFrame): DataFrame = {
    require(requests.columns.length == 1,
      s"requests must be a single-column key frame, got ${requests.columns.mkString(", ")}")
    val r = requests.toDF("_erase_key").distinct()
    df.join(r, key === col("_erase_key"), "left_anti")
  }

  /** Erasure-cascade audit: for each named table (and its user key),
    * one row `(table, rows_before, rows_erased, rows_after)` — the
    * compliance artifact a deletion request requires (the regulator
    * asks "what was deleted WHERE", across the base table AND every
    * derived materialization that inherited the key). One left join +
    * one ungrouped aggregate per table (both map-side-combinable; the
    * request side deduplicated then typically broadcast), unioned —
    * tables are audited independently, so the union is driver-cheap. */
  def erasureAudit(tables: Seq[(String, DataFrame, Column)],
                   requests: DataFrame): DataFrame = {
    require(tables.nonEmpty, "need at least one table to audit")
    require(requests.columns.length == 1,
      s"requests must be a single-column key frame, got ${requests.columns.mkString(", ")}")
    val r = requests.toDF("_erase_key").distinct()
    tables.map { case (name, df, key) =>
      df.select(key.as("_k"))
        .join(r, col("_k") === col("_erase_key"), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          count(col("_erase_key")).as("rows_erased"))
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_erased"),
          (col("rows_before") - col("rows_erased")).as("rows_after"))
    }.reduce(_.unionAll(_))
  }
}
