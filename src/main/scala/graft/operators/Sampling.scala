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

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-Res, reservoir-free form): every row draws
    * `u = (portableHash(id) + 1) / 2^60 ∈ (0, 1]` and is ranked by
    * `key = ln(u) / w` — the n rows with the LARGEST key (ln u ≤ 0, so
    * heavier weights pull the key toward 0) are exactly a weight-
    * proportional sample without replacement. No RNG state anywhere:
    * the hash makes the draw a pure function of the id, so the sample
    * is identical across runs, engines, and partitionings — the
    * auditable mixture-sampling primitive (same rationale as the q66
    * hash split, with per-row inclusion probability ∝ weight).
    *
    * Scale shape: one projection computing (id, w, key) + a global
    * top-n, which Spark plans as TakeOrderedAndProject — bounded
    * per-partition heaps, no shuffle of anything but n winners per
    * partition; document bodies never move (callers semi-join winners
    * back, like [[stratifiedExact]]). Rows with w ≤ 0 or null are
    * excluded by contract (zero weight = never sampled). The emitted
    * `es_key` is rounded for display; ordering uses the raw key with
    * the id as tie-break. */
  def weightedTopN(df: DataFrame, idCol: Column, weightCol: Column,
                   n: Int): DataFrame = {
    val u = (portableHash(idCol.cast("string")) + lit(1L)).cast("double") /
      lit(1152921504606846976.0) // 2^60 — portableHash is 60-bit
    val key = log(u) / weightCol.cast("double")
    df.filter(weightCol.isNotNull && weightCol.cast("double") > 0)
      .select(idCol.as("sid"), weightCol.cast("double").as("w"), key.as("_key"))
      .orderBy(col("_key").desc, col("sid"))
      .limit(n)
      .select(col("sid"), col("w"), round(col("_key"), 6).as("es_key"))
  }

  /** Per-stratum [[weightedTopN]]: within each stratum keep the `n` rows
    * ranking first by the Efraimidis–Spirakis key — a weight-proportional
    * draw without replacement PER GROUP (per-language eval subsets drawn
    * ∝ quality weight, per-source hard-example mining). Same determinism
    * contract as [[weightedTopN]]; same narrow-projection shape as
    * [[stratifiedExact]] (the window ranks (stratum, id, w, key) only —
    * bodies rejoin via the returned ids). Rows with w ≤ 0 or null never
    * sample. */
  def weightedTopNPerStratum(df: DataFrame, stratumCol: Column, idCol: Column,
                             weightCol: Column, n: Int): DataFrame = {
    val u = (portableHash(idCol.cast("string")) + lit(1L)).cast("double") /
      lit(1152921504606846976.0)
    val key = log(u) / weightCol.cast("double")
    df.filter(weightCol.isNotNull && weightCol.cast("double") > 0)
      .select(stratumCol.as("stratum"), idCol.as("sid"),
        weightCol.cast("double").as("w"), key.as("_key"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("_key").desc, col("sid"))))
      .filter(col("rk") <= n)
      .select(col("stratum"), col("sid"), col("w"), col("rk"))
  }

  /** Deterministic temperature-weighted mixture ORDER — the training-order
    * writer of a multi-source pipeline (T5/Pile-style source mixing):
    * within each source, documents are ranked by the portable hash (a
    * deterministic shuffle); the k-th document of source s is assigned
    * virtual time `vt = k / w_s`, and the global order by vt interleaves
    * sources ∝ their weights — source s contributes w_s docs per unit of
    * virtual time, with no RNG and no coordination between sources.
    *
    * Scale shape: one window over a narrow (source, id, hash) projection
    * (partitioned by source — the same exchange [[stratifiedExact]]
    * pays), then the head of the order via TakeOrderedAndProject. The
    * FULL order at 100 TB is a range-partitioned sort by vt (Spark's
    * distributed sort) writing directly to the training manifest — no
    * global row numbering anywhere. vt is exact-integer k over a literal
    * weight: bit-identical across engines. Sources missing from
    * `weights` are excluded (weight 0 = not in the mixture). */
  def mixtureOrder(df: DataFrame, idCol: Column, sourceCol: Column,
                   weights: Map[String, Double], n: Int): DataFrame =
    mixtureVt(df, idCol, sourceCol, weights)
      .orderBy(col("vt"), col("source"), col("sid"))
      .limit(n)
      .select(col("sid"), col("source"), col("k"), round(col("vt"), 6).as("vt"))

  /** The FULL mixture order as a globally-sorted frame — what actually
    * writes the 100 TB training manifest. `orderBy(vt)` plans a
    * RangePartitioning exchange (sampled split points, every partition
    * sorts its own range in parallel) — file i of the written manifest
    * holds positions strictly before file i+1, and NOTHING funnels
    * through a single-partition sort or a global row number
    * (plan-asserted in SamplingSpec). */
  def mixtureManifest(df: DataFrame, idCol: Column, sourceCol: Column,
                      weights: Map[String, Double]): DataFrame =
    mixtureVt(df, idCol, sourceCol, weights)
      .orderBy(col("vt"), col("source"), col("sid"))
      .select(col("sid"), col("source"), col("k"), col("vt"))

  /** [[mixtureManifest]] without the per-source single-task window —
    * the form that survives one source owning most of a 100 TB corpus.
    * The per-source rank comes from [[Relational.prefixSum]] over the
    * TOTAL order (source, hash, sid) with value 1: the global running
    * count restarts per source by subtracting each source's first
    * running value (a |sources|-row aggregate, broadcast back). Same
    * exact (sid, source, k, vt) values as the window form — a spec
    * holds them equal — except k is LONG here (the window form's
    * row_number is int-bounded; this form is the one that outlives
    * 2^31 rows per source) — at the cost of one extra narrow pass: one
    * range exchange
    * (prefixSum) + one tiny aggregate instead of one hash exchange.
    * Rows of a hot source spread across MANY range partitions instead
    * of one window task; nothing anywhere holds more than a partition. */
  def mixtureManifestWide(df: DataFrame, idCol: Column, sourceCol: Column,
                          weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "every mixture weight must be positive")
    val wCol = element_at(typedLit(weights), col("source"))
    val proj = df.select(sourceCol.as("source"), idCol.as("sid"),
        portableHash(idCol.cast("string")).as("_h"))
      .filter(wCol.isNotNull)
    val ranked = Relational.prefixSum(proj,
      struct(col("source"), col("_h"), col("sid")), lit(1L))
    val starts = ranked.groupBy("source")
      .agg(min(col("running")).as("_start"))
    // k stays LONG here: the wide form's whole reason to exist is a
    // single source past the ~2^31-row ceiling where the window form's
    // row_number (int) lives — casting the rank to int would wrap k
    // negative exactly in that regime and silently sort garbage to the
    // front of the manifest.
    ranked.join(broadcast(starts), Seq("source"))
      .withColumn("k", col("running") - col("_start") + 1L)
      .withColumn("vt", col("k").cast("double") / wCol)
      .orderBy(col("vt"), col("source"), col("sid"))
      .select(col("sid"), col("source"), col("k"), col("vt"))
  }

  /** Shared (sid, source, k, vt) assignment of [[mixtureOrder]] /
    * [[mixtureManifest]]: k = the row's hash rank within its source,
    * vt = k / w_source.
    *
    * SCALE BOUND: the `partitionBy(source)` window funnels each source's
    * ENTIRE (sid, hash) projection through one task — fine for the
    * typical mixture of a handful of sources up to ~100M rows each
    * (narrow 3-column rows), but a single web-crawl source at 100 TB
    * would hit the per-task ceiling. [[mixtureManifestWide]] is the
    * implemented scale-out form (prefixSum-based two-pass rank, no
    * single-task sort); this window form stays the default because it
    * is one pass cheaper at the corpus shapes the oracle tests pin
    * down. */
  private def mixtureVt(df: DataFrame, idCol: Column, sourceCol: Column,
                        weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "every mixture weight must be positive")
    val wCol = element_at(typedLit(weights), col("source"))
    df.select(sourceCol.as("source"), idCol.as("sid"),
        portableHash(idCol.cast("string")).as("_h"))
      .filter(wCol.isNotNull)
      .withColumn("k", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("_h"), col("sid"))))
      .withColumn("vt", col("k").cast("double") / wCol)
  }

  /** Temperature-scaled mixture allocation (the multilingual α-sampling
    * rebalance of XLM-R/mC4): a class's share of the training budget is
    * proportional to `(n_class/N)^α` instead of its natural share, so
    * α < 1 up-weights low-resource classes and α = 1 keeps the natural
    * mix. Returns one row per class: `(class, n_docs, z6, alloc)`.
    *
    * Engine-portable by EXACT arithmetic — the same discipline as
    * `portableHash`: the tempered score is integerized as
    * `z6 = floor((n/N)^α · 10⁶)` and the allocation as
    * `alloc = budget·z6 div Σz6` (integer multiply/divide). For the
    * default α = 0.5 the float steps are `/`, `sqrt`, `·10⁶` — all
    * correctly rounded by IEEE 754, so every engine computes the
    * identical z6 and the allocation is bit-determined end to end; no
    * summation-order or libm-ulp hazard anywhere (`pow` for other α is
    * correctly rounded on common platforms but not IEEE-guaranteed,
    * which is why the oracle binding pins α = 0.5). Σ alloc ≤ budget
    * with shortfall < |classes| (floor residue; the standard
    * largest-remainder patch is caller policy, not taken here so the
    * allocation stays a pure per-class function of (n, N, budget)).
    *
    * Scale shape: one map-side-combinable count shuffle to |classes|
    * rows; the total and Σz6 are 1-row aggregates broadcast back — the
    * whole computation after the count is on a |classes|-row frame.
    */
  def temperatureAllocation(df: DataFrame, classCol: Column,
                            budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(classCol.as("class")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum("n_docs").as("n_total"))
    val share = col("n_docs").cast("double") / col("n_total").cast("double")
    val tempered = if (alpha == 0.5) sqrt(share) else pow(share, lit(alpha))
    val z = counts.crossJoin(broadcast(total))
      .withColumn("z6", floor(tempered * lit(1000000.0)).cast("long"))
    val zSum = z.agg(sum("z6").as("z_sum"))
    z.crossJoin(broadcast(zSum))
      .select(col("class"), col("n_docs"),
        col("z6"),
        expr(s"$budget * z6 div z_sum").as("alloc"))
  }

  /** Draw the temperature-allocated sample: each class contributes its
    * [[temperatureAllocation]] `alloc` rows, chosen deterministically by
    * portable-hash rank within the class (same keyed-draw discipline as
    * [[stratifiedExact]] — reproducible across runs, engines, and
    * partitionings). One narrow per-class window (rank over
    * (class, id, hash)) plus a broadcast join of the |classes|-row
    * allocation table; document bodies never enter the shuffle (callers
    * semi-join the returned ids when they need full rows).
    */
  /** NOTE the input is read twice — by the allocation's class count and
    * by the rank window. For a cheap scan that is the right trade (an
    * r19 A/B persisting the projection inside this operator made raw-scan
    * callers like q132 ~0.1 s SLOWER — materialization cost with nothing
    * saved). A caller feeding an EXPENSIVE derived frame (q135's
    * unigram-surprisal buckets) should persist that frame itself — see
    * the q135 builder. */
  def temperatureDraw(df: DataFrame, classCol: Column, idCol: Column,
                      budget: Long, alpha: Double = 0.5): DataFrame = {
    val alloc = temperatureAllocation(df, classCol, budget, alpha)
      .select(col("class"), col("alloc"))
    df.select(classCol.as("class"), idCol.as("sid"),
        portableHash(idCol.cast("string")).as("_h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("class")).orderBy(col("_h"), col("sid"))))
      .join(broadcast(alloc), Seq("class"))
      .filter(col("rk") <= col("alloc"))
      .select(col("class"), col("sid"), col("rk"))
  }

  // ---- mixture epoch planning -----------------------------------------

  /** `floor(b·w / s)` in overflow-staged integer SQL (both Spark SQL with
    * `divOp = "div"` and DuckDB with `divOp = "//"`): decompose b = q·s+r,
    * so floor(b·w/s) = q·w + floor(r·w/s) exactly (q·w is an integer).
    * Safe while `(b mod s)·w` and `(b div s)·w` stay inside int64 —
    * callers pick which operand plays b so the small one multiplies. */
  def mulDivSql(bE: String, wE: String, sE: String, divOp: String): String =
    s"((($bE) $divOp ($sE)) * ($wE) + ((($bE) % ($sE)) * ($wE)) $divOp ($sE))"

  /** `floor(a·10⁶ / b)` staged as two ·10³ hops (each exact by the same
    * q·s+r lemma), so `a` only ever multiplies by 1000 — safe to
    * a,b ≈ 9·10¹⁵, i.e. quadrillions of tokens per source. */
  def microRatioSql(aE: String, bE: String, divOp: String): String = {
    val a3 = s"(($aE) * 1000)"
    s"(($a3 $divOp ($bE)) * 1000 + (($a3 % ($bE)) * 1000) $divOp ($bE))"
  }

  /** Per-source repetition (epoch) plan under a token budget — the
    * data-mixing question a pretraining run answers before it starts:
    * given each source's token count, a target mixture weight, a total
    * token budget, and a repetition ceiling (the data-constrained-scaling
    * rule of thumb that repeating a source beyond ~4 epochs stops
    * helping), how many epochs of each source does the run take, and
    * what mixture does that actually realize once the cap binds?
    *
    * Per source: `target = floor(budget·w / Σw)`, `epochs_micro =
    * min(maxEpochs·10⁶, floor(target·10⁶ / tokens))`,
    * `planned_tokens = floor(epochs_micro·tokens / 10⁶)`, `share_ppm =
    * floor(planned·10⁶ / Σplanned)`. A capped source under-fills its
    * target and the realized share drifts from the requested mixture —
    * that drift (requested w vs share_ppm) is the signal the planner
    * exists to surface. Sources missing from `weights` are excluded
    * (weight 0); a source with zero tokens plans zero epochs.
    *
    * Engine-portable by EXACT integer arithmetic end to end (same
    * discipline as [[temperatureAllocation]]): weights integerize to ppm
    * on the driver, and every ratio is an overflow-staged int64
    * floor-division ([[mulDivSql]]/[[microRatioSql]]) — no float step
    * anywhere, so any engine computes bit-identical plans. Documented
    * bounds: budget·wppm staged through Σwppm (safe to ~9·10¹² budget
    * per 10⁶ Σwppm), token counts to ~9·10¹⁵ per source.
    *
    * Scale shape: one map-side-combinable grouped sum to |sources| rows;
    * everything after is arithmetic on that tiny frame plus a 1-row
    * broadcast total. The corpus is touched exactly once. */
  def epochPlan(df: DataFrame, sourceCol: Column, tokenCntCol: Column,
                weights: Map[String, Double], budget: Long,
                maxEpochs: Double = 4.0): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "every mixture weight must be positive")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    val wppm = weights.map { case (s, w) => s -> math.floor(w * 1e6).toLong }
    val wsum = wppm.values.sum
    val maxE6 = math.floor(maxEpochs * 1e6).toLong
    val counts = df
      .select(sourceCol.as("source"), tokenCntCol.cast("long").as("_tc"))
      .filter(element_at(typedLit(wppm), col("source")).isNotNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_tc").as("n_tokens"))
      .withColumn("_wppm", element_at(typedLit(wppm), col("source")))
      .withColumn("_target",
        expr(mulDivSql(budget.toString, "_wppm", wsum.toString, "div")))
      .withColumn("epochs_micro",
        when(col("n_tokens") === 0, 0L).otherwise(
          expr(s"least(${maxE6}L, ${microRatioSql("_target", "n_tokens", "div")})")))
      .withColumn("planned_tokens",
        expr(mulDivSql("n_tokens", "epochs_micro", "1000000", "div")))
    val total = counts.agg(sum("planned_tokens").as("_t_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        when(col("_t_total") === 0, 0L)
          .otherwise(expr(microRatioSql("planned_tokens", "_t_total", "div"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("epochs_micro"), col("planned_tokens"), col("share_ppm"))
  }
}
