package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling.microRatioSql

/** Distribution-drift telemetry for a continuously-ingesting corpus —
  * the data-quality monitor a 100 TB pipeline runs per ingestion window:
  * did today's bucket mix (event types, languages, sources, length
  * bands) shift against yesterday's, or against a pinned reference
  * release? Extension tier (the reference pipelines are one-shot batch;
  * `/root/reference` has no ingestion-monitoring surface); the statistic
  * is two-sample total-variation distance, the same integer-exact
  * formulation [[Privacy.tCloseness]] uses for its per-group audit —
  * TVD(P,Q) = ½·Σ_b |c_b/N − d_b/M| carried as the integer numerator
  * Σ_b |c_b·M − d_b·N| over the denominator 2·N·M, so any engine
  * computes bit-identical verdicts (no float summation order anywhere).
  *
  * Scale discipline: the corpus is touched exactly once per frame — ONE
  * map-side-combinable (window, bucket) count — and everything after
  * runs on the |windows × buckets| histogram (tiny for any sensible
  * bucketing; a high-cardinality bucket column is the caller's bug, not
  * a funnel: it still never windows over corpus rows). Long-arithmetic
  * bound shared with tCloseness: c·M ≤ N·M needs per-window row counts
  * under ~3·10⁹; beyond that, shard windows before auditing.
  *
  * NULL bucket (or group) values follow SQL join semantics on BOTH
  * engines — null never equals null, so a null bucket present on both
  * sides of a pair lands as two non-matching rows and its mass counts
  * as a vanish PLUS an appearance (over-counted, but identically in
  * Spark and DuckDB). If nulls are a real bucket, coalesce them to a
  * sentinel before auditing. */
object Drift {

  /** Consecutive-period drift series: for every period p with a
    * predecessor p−1 in the data, the exact-integer TVD between the two
    * periods' bucket histograms, in parts-per-million, plus a
    * SELF-NORMALIZING alert verdict: `drifted` iff
    * `tvd_ppm > (alertNum/alertDen) · mean(tvd_ppm over the series)` —
    * compared as `alertDen·k·tvd_ppm > alertNum·Σtvd_ppm` (k = series
    * length), fully integer. A fixed absolute threshold cannot work
    * across corpus sizes (per-window sampling noise scales the whole
    * series ~1/√N), so the alert is relative to the series' own noise
    * floor — the rule an ingestion monitor actually pages on.
    *
    * `periodCol` must be integer-valued with consecutive periods
    * differing by exactly 1 (days since epoch via `unix_date`, hour
    * index, release sequence number). Buckets absent on one side
    * contribute their full mass (coalesced to count 0 — a vanished or
    * brand-new bucket IS drift). Edge periods (no predecessor present)
    * are dropped, not reported as trivially drifted.
    *
    * Output: (period, n_prev, n_cur, tvd_num, tvd_ppm, drifted).
    * Plan shape: corpus-scale groupBy once; then a shifted self-join,
    * two totals joins, and a 1-row broadcast-cross for the series mean —
    * all on the histogram frame. The histogram is persisted via `scope`
    * (the [[CacheScope]] discipline): four plan branches read it (both
    * sides of the shifted self-join and both totals), and without the
    * persist each branch re-aggregates the corpus — 4 passes instead
    * of 1 (measured 7.8 s → 1.9 s at 1M rows). */
  def tvdSeries(df: DataFrame, periodCol: Column, bucketCol: Column,
                alertNum: Long = 3L, alertDen: Long = 2L,
                scope: CacheScope = CacheScope.unmanaged): DataFrame =
    tvdSeriesBy(df, Nil, periodCol, bucketCol, alertNum, alertDen, scope)

  /** [[tvdSeries]] PER GROUP — the fleet form an ingestion monitor
    * actually runs (one drift series per source/pipeline/event type,
    * not one pooled series that a big stable group would drown). Group
    * columns come back as `g0..gN` (the [[Privacy.lDiversity]] `q0`
    * naming precedent); the alert mean is computed WITHIN each group's
    * own series, so a noisy little source cannot page a quiet big one.
    * Periods missing inside a group (no rows that day) break the chain
    * there — both bordering pairs drop, same as the global edge rule.
    * Same plan shape as the global form with the group keys prepended
    * to every aggregation/join key; the per-group series stats join is
    * a co-partitioned equi-join on the group keys instead of the 1-row
    * broadcast-cross. */
  def tvdSeriesBy(df: DataFrame, by: Seq[Column],
                  periodCol: Column, bucketCol: Column,
                  alertNum: Long = 3L, alertDen: Long = 2L,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(alertNum >= 1 && alertDen >= 1,
      s"alert multiple must be a positive fraction, got $alertNum/$alertDen")
    seriesFromPaired(paired(df, by, periodCol, bucketCol, scope),
      by.indices.map(i => s"g$i"), alertNum, alertDen)
  }

  /** [[tvdSeriesBy]] over PRE-COUNTED histogram rows
    * `(group.., period, bucket, count)` instead of raw corpus rows —
    * the maintained-histogram form a production monitor actually runs:
    * per-(period, bucket) counts are ADDITIVE, so an ingestion stream
    * appends each micro-batch's own tiny groupBy as a new generation
    * (see `streaming.DriftStream`) and the daily series runs on the
    * accumulated histogram WITHOUT ever rescanning the corpus — at
    * 100 TB the corpus-scale aggregate [[tvdSeriesBy]] pays is exactly
    * the scan this form amortizes across arrivals. Duplicate
    * (group, period, bucket) rows are summed, so appended generations
    * are accepted as-is (the [[tvdFromHistograms]] contract). Output
    * and alert rule identical to [[tvdSeriesBy]] row-for-row
    * (spec-pinned; the two share [[pairedFromHist]] and
    * [[seriesFromPaired]], so they cannot drift). */
  def tvdSeriesFromCounts(counts: DataFrame, by: Seq[Column],
                          periodCol: Column, bucketCol: Column,
                          countCol: Column,
                          alertNum: Long = 3L, alertDen: Long = 2L,
                          scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(alertNum >= 1 && alertDen >= 1,
      s"alert multiple must be a positive fraction, got $alertNum/$alertDen")
    val gNames = by.indices.map(i => s"g$i")
    val keyed = by.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val hist = scope.persist(counts
      .select(keyed ++ Seq(periodCol.cast("long").as("period"),
        bucketCol.as("_b"), countCol.cast("long").as("_c")): _*)
      .groupBy((gNames.map(col) :+ col("period")) :+ col("_b"): _*)
      .agg(sum("_c").as("_c")))
    seriesFromPaired(pairedFromHist(hist, gNames), gNames, alertNum, alertDen)
  }

  /** Consecutive-period POPULATION STABILITY INDEX series — the other
    * drift statistic a model-monitoring review asks for by name:
    * PSI(P,Q) = Σ_b (p_b − q_b)·ln(p_b/q_b), with the industry's fixed
    * reading (<0.1 stable, 0.1–0.25 moderate, ≥0.25 shifted). PSI
    * complements [[tvdSeries]]: TVD weighs every moved row equally,
    * PSI's log ratio amplifies buckets whose RELATIVE mass moved (a
    * 0.1%→1% bucket barely registers in TVD but screams in PSI), which
    * is why scorecard monitoring standardized on it; the fixed
    * threshold works because add-one smoothing plus the log form keep
    * the statistic scale-comparable where raw TVD is not.
    *
    * Engine-portability discipline (the [[Privacy.dpNoisySums]] ln
    * precedent): both sides' proportions are add-one-smoothed over the
    * pair's bucket UNION (p = (c+1)/(N+B) — vanished and brand-new
    * buckets contribute a finite, large term instead of ±∞), quantized
    * to micro-proportions by integer division and clamped at 1 micro,
    * and each bucket's term is ONE float tree
    * ⌊(p_µ − q_µ)·ln(p_µ/q_µ)⌋ floored to a long BEFORE the sum — the
    * cross-bucket sum is integer, so no float-summation-order hazard
    * exists anywhere; psi_micro ≈ PSI·10⁶ (per-bucket flooring
    * under-counts by <1 micro per bucket, identically on both
    * engines). Terms are never negative ((p−q) and ln(p/q) share
    * sign), so flooring is the only bias and it is one-sided.
    *
    * Same scale shape as [[tvdSeries]]: one corpus-scale
    * map-side-combinable count, then everything — including the
    * per-pair bucket-union count, a window over the histogram —
    * runs on |periods × buckets| rows. Output:
    * (group.., period, n_prev, n_cur, n_buckets, psi_micro, level). */
  def psiSeries(df: DataFrame, periodCol: Column, bucketCol: Column,
                scope: CacheScope = CacheScope.unmanaged): DataFrame =
    psiSeriesBy(df, Nil, periodCol, bucketCol, scope)

  /** [[psiSeries]] per group (the [[tvdSeriesBy]] fleet form; group
    * columns come back as `g0..gN`). */
  def psiSeriesBy(df: DataFrame, by: Seq[Column],
                  periodCol: Column, bucketCol: Column,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame =
    psiFromPaired(paired(df, by, periodCol, bucketCol, scope),
      by.indices.map(i => s"g$i"))

  /** [[psiSeriesBy]] over PRE-COUNTED histogram rows — the
    * maintained-histogram form ([[tvdSeriesFromCounts]]'s contract:
    * duplicate (group, period, bucket) generations sum, the corpus is
    * never rescanned). Shares [[pairedFromHist]] and [[psiFromPaired]]
    * with the raw-row path, so the two cannot drift (spec-pinned). */
  def psiSeriesFromCounts(counts: DataFrame, by: Seq[Column],
                          periodCol: Column, bucketCol: Column,
                          countCol: Column,
                          scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val gNames = by.indices.map(i => s"g$i")
    val keyed = by.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val hist = scope.persist(counts
      .select(keyed ++ Seq(periodCol.cast("long").as("period"),
        bucketCol.as("_b"), countCol.cast("long").as("_c")): _*)
      .groupBy((gNames.map(col) :+ col("period")) :+ col("_b"): _*)
      .agg(sum("_c").as("_c"))
      // a bucket whose generations sum to 0 never appears in the
      // raw-row path's histogram; keeping it would inflate the pair's
      // union bucket count _nb and shift every bucket's smoothed p/q
      // (TVD was insensitive to such rows — PSI is not)
      .filter(col("_c") > 0L))
    psiFromPaired(pairedFromHist(hist, gNames), gNames)
  }

  /** The per-period PSI aggregate shared by the raw-row and
    * pre-counted forms: smoothed micro-proportions over the pair's
    * bucket union, per-bucket term floored to a long BEFORE the
    * cross-bucket (integer) sum, fixed industry thresholds. */
  private def psiFromPaired(pairedF: DataFrame, gNames: Seq[String]): DataFrame = {
    val keys = gNames :+ "period"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    pairedF
      .withColumn("_nb", count(lit(1)).over(w))
      .withColumn("_p",
        expr("greatest(1, ((_c + 1) * 1000000) div (n_cur + _nb))"))
      .withColumn("_q",
        expr("greatest(1, ((_cp + 1) * 1000000) div (n_prev + _nb))"))
      .withColumn("_term", expr(psiTermSql("_p", "_q")))
      .groupBy(keys.map(col): _*)
      .agg(max("n_prev").as("n_prev"), max("n_cur").as("n_cur"),
        max("_nb").cast("long").as("n_buckets"),
        sum("_term").cast("long").as("psi_micro"))
      .withColumn("level",
        when(col("psi_micro") < 100000L, lit("stable"))
          .when(col("psi_micro") < 250000L, lit("moderate"))
          .otherwise(lit("shifted")))
  }

  /** The per-bucket PSI term ⌊(p_µ − q_µ)·ln(p_µ/q_µ)⌋ as SQL text,
    * generated for BOTH engines from one helper (the
    * [[graft.operators.Sampling.microRatioSql]] anti-drift rule) —
    * `ln`, `floor`, and the DOUBLE/BIGINT casts spell identically in
    * Spark SQL and DuckDB. */
  def psiTermSql(pE: String, qE: String): String =
    s"CAST(floor((($pE) - ($qE)) * ln(CAST(($pE) AS DOUBLE) / CAST(($qE) AS DOUBLE))) AS BIGINT)"

  /** The per-period TVD aggregate + self-normalizing alert shared by
    * the raw-row and pre-counted series forms. */
  private def seriesFromPaired(pairedF: DataFrame, gNames: Seq[String],
                               alertNum: Long, alertDen: Long): DataFrame = {
    val gCols = gNames.map(col)
    val keys = gNames :+ "period"
    val perPeriod = pairedF
      .groupBy(keys.map(col): _*)
      .agg(max("n_prev").as("n_prev"), max("n_cur").as("n_cur"),
        sum(abs(col("_c") * col("n_prev") - col("_cp") * col("n_cur")))
          .cast("long").as("tvd_num"))
      .withColumn("_den", lit(2L) * col("n_cur") * col("n_prev"))
      .withColumn("tvd_ppm", expr(microRatioSql("tvd_num", "_den", "div")))
      .drop("_den")
    val series = perPeriod.groupBy(gCols: _*).agg(
      count(lit(1)).as("_k"), sum("tvd_ppm").cast("long").as("_s"))
    val withStats =
      if (gNames.isEmpty) perPeriod.crossJoin(broadcast(series)) // 1 row
      else perPeriod.join(series, gNames) // co-partitioned on the keys
    withStats
      .withColumn("drifted",
        lit(alertDen) * col("_k") * col("tvd_ppm") > lit(alertNum) * col("_s"))
      .drop("_k", "_s")
  }

  /** The shared consecutive-pair frame: per (group.., period, bucket),
    * both sides' counts (absent side coalesced to 0) and both period
    * totals, edges/broken chains already dropped. One corpus-scale
    * map-side-combinable count (persisted — four plan branches read
    * it); everything else runs on the |groups × periods × buckets|
    * histogram. [[tvdSeriesBy]] aggregates this to per-period TVD;
    * [[tvdAttribution]] ranks inside it. */
  private def paired(df: DataFrame, by: Seq[Column],
                     periodCol: Column, bucketCol: Column,
                     scope: CacheScope): DataFrame = {
    val gNames = by.indices.map(i => s"g$i")
    val gCols = gNames.map(col)
    val keyed = by.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val hist = scope.persist(df
      .select(keyed ++ Seq(periodCol.cast("long").as("period"),
        bucketCol.as("_b")): _*)
      .groupBy((gCols :+ col("period")) :+ col("_b"): _*)
      .agg(count(lit(1)).as("_c")))
    pairedFromHist(hist, gNames)
  }

  /** [[paired]]'s tail over an already-canonical persisted histogram
    * `(g0.., period, _b, _c)` — shared with the pre-counted entry
    * points so the raw-row and maintained-histogram paths cannot
    * drift. */
  private def pairedFromHist(hist: DataFrame, gNames: Seq[String]): DataFrame = {
    val gCols = gNames.map(col)
    val keys = gNames :+ "period"
    val tot = hist.groupBy(keys.map(col): _*)
      .agg(sum("_c").cast("long").as("n_cur"))
    val prevHist = hist.select(
      gCols ++ Seq((col("period") + 1).as("period"), col("_b"),
        col("_c").as("_cp")): _*)
    val prevTot = tot.select(
      gCols ++ Seq((col("period") + 1).as("period"),
        col("n_cur").as("n_prev")): _*)
    hist.join(prevHist, keys :+ "_b", "full")
      .select((keys.map(col) :+ col("_b") :+
        coalesce(col("_c"), lit(0L)).as("_c")) :+
        coalesce(col("_cp"), lit(0L)).as("_cp"): _*)
      .join(tot, keys).join(prevTot, keys) // inner: edges drop
  }

  /** Root-cause drill-down for a drift alert: per consecutive-period
    * pair, the top-k BUCKETS by their contribution |c·M − cp·N| to the
    * pair's TVD numerator (`Σ contrib_num == tvd_num` of the matching
    * [[tvdSeriesBy]] row — the spec pins the decomposition), with the
    * contribution in ppm of the pair denominator. The answer to the
    * page that q193/q197 raise: WHICH buckets moved. Rank ties break
    * on the bucket value; the rank runs over the histogram frame —
    * corpus rows never enter a window. Output:
    * (group.., period, bucket, c_prev, c_cur, contrib_num, contrib_ppm, rk). */
  def tvdAttribution(df: DataFrame, by: Seq[Column],
                     periodCol: Column, bucketCol: Column, k: Int,
                     scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(k >= 1, s"top-k must be >= 1, got $k")
    val gNames = by.indices.map(i => s"g$i")
    val keys = gNames :+ "period"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("contrib_num").desc, col("bucket"))
    paired(df, by, periodCol, bucketCol, scope)
      .withColumn("contrib_num",
        abs(col("_c") * col("n_prev") - col("_cp") * col("n_cur")))
      .withColumn("_den", lit(2L) * col("n_cur") * col("n_prev"))
      .withColumn("contrib_ppm",
        expr(microRatioSql("contrib_num", "_den", "div")))
      .withColumnRenamed("_b", "bucket")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select((keys.map(col) :+ col("bucket") :+
        col("_cp").as("c_prev") :+ col("_c").as("c_cur") :+
        col("contrib_num") :+ col("contrib_ppm") :+ col("rk")): _*)
  }

  /** The monitor's actual PAGE PAYLOAD: every alerted period of the
    * [[tvdSeriesBy]] series joined to its top-`k` [[tvdAttribution]]
    * buckets — one artifact answering both "did it drift" and "which
    * buckets moved", which is what the on-call reads (shipping the
    * series and the drill-down separately makes the responder re-run
    * the join by hand at 3am). One row per (alerted period × top-k
    * bucket): the series stats plus that bucket's contribution.
    *
    * Plan shape: the corpus is still touched exactly once — BOTH
    * composed operators read the shared `paired` histogram, whose
    * scope-persist deduplicates in the cache manager (same analyzed
    * plan → one cached build; pass a real scope or the unmanaged
    * default, but pass the SAME one). Everything else — the series
    * aggregate, the attribution rank, the alert filter, the final
    * equi-join on (group.., period) — runs on histogram-sized frames. */
  def driftReport(df: DataFrame, by: Seq[Column],
                  periodCol: Column, bucketCol: Column, k: Int,
                  alertNum: Long = 3L, alertDen: Long = 2L,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val keys = by.indices.map(i => s"g$i") :+ "period"
    tvdSeriesBy(df, by, periodCol, bucketCol, alertNum, alertDen, scope)
      .filter(col("drifted"))
      .drop("drifted")
      .join(tvdAttribution(df, by, periodCol, bucketCol, k, scope), keys)
  }

  /** Reference-vs-current drift gate: ONE row with the exact-integer TVD
    * between the two frames' bucket histograms and a fixed-threshold
    * verdict `drifted` iff `tvd_ppm·tDen > tNum·10⁶` — the promote/hold
    * decision when a candidate ingestion window is compared against a
    * pinned reference release (fixed threshold is right here: the
    * reference is a contract, not a noise floor). Absent buckets count
    * their full mass on either side. Output:
    * (n_ref, n_cur, tvd_num, tvd_ppm, drifted). */
  def tvdBetween(ref: DataFrame, refBucket: Column,
                 cur: DataFrame, curBucket: Column,
                 tNum: Long, tDen: Long): DataFrame =
    tvdFromHistograms(
      ref.select(refBucket.as("_b")).groupBy("_b").agg(count(lit(1)).as("_n")),
      col("_b"), col("_n"),
      cur.select(curBucket.as("_b")).groupBy("_b").agg(count(lit(1)).as("_n")),
      col("_b"), col("_n"), tNum, tDen)

  /** Reference-vs-current PSI gate — [[psiSeries]]'s statistic in
    * [[tvdBetween]]'s shape: the scorecard-monitoring promote/hold
    * decision compares a candidate window against the PINNED reference
    * distribution (the training mix) and reads the fixed industry
    * thresholds. Same smoothing/float discipline as the series form:
    * add-one over the union of buckets, micro-proportions by integer
    * division clamped at 1 µ, each bucket's ⌊(p_µ−q_µ)·ln(p_µ/q_µ)⌋
    * floored to a long BEFORE the integer sum. Output (1 row):
    * (n_ref, n_cur, n_buckets, psi_micro, level). Both sides empty →
    * NULL counts and psi with level 'shifted' — the fail-safe reading:
    * an empty window against a pinned reference is maximally alarming,
    * never silently 'stable'. */
  def psiBetween(ref: DataFrame, refBucket: Column,
                 cur: DataFrame, curBucket: Column): DataFrame = {
    val h1 = ref.select(refBucket.as("_b")).groupBy("_b")
      .agg(count(lit(1)).cast("long").as("_cr"))
    val h2 = cur.select(curBucket.as("_b")).groupBy("_b")
      .agg(count(lit(1)).cast("long").as("_cc"))
    val joined = h1.join(h2, Seq("_b"), "full")
      .select(coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_cc"), lit(0L)).as("_cc"))
    val totals = joined.agg(sum("_cr").cast("long").as("n_ref"),
      sum("_cc").cast("long").as("n_cur"),
      count(lit(1)).as("_nb")) // 1 row
    joined.crossJoin(broadcast(totals))
      .withColumn("_p",
        expr("greatest(1, ((_cc + 1) * 1000000) div (n_cur + _nb))"))
      .withColumn("_q",
        expr("greatest(1, ((_cr + 1) * 1000000) div (n_ref + _nb))"))
      .withColumn("_term", expr(psiTermSql("_p", "_q")))
      .groupBy()
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        max("_nb").cast("long").as("n_buckets"),
        sum("_term").cast("long").as("psi_micro"))
      .withColumn("level",
        when(col("psi_micro") < 100000L, lit("stable"))
          .when(col("psi_micro") < 250000L, lit("moderate"))
          .otherwise(lit("shifted")))
  }

  /** [[tvdBetween]] over PRE-COUNTED histograms `(bucket, count)` — the
    * state shape a streaming drift monitor holds between ingestion
    * windows (the previous window's histogram is tiny by the bucketing
    * contract, so it lives as driver/operator state while the corpus
    * rows flow through once per micro-batch; EventsStreamSpec pins that
    * the per-batch emissions equal the batch [[tvdSeries]] numbers).
    * Duplicate bucket rows are summed, so any partially-combined
    * histogram is accepted. */
  def tvdFromHistograms(ref: DataFrame, refBucket: Column, refCount: Column,
                        cur: DataFrame, curBucket: Column, curCount: Column,
                        tNum: Long, tDen: Long): DataFrame = {
    require(tDen >= 1 && tNum >= 0 && tNum <= tDen,
      s"t must be a fraction in [0,1], got $tNum/$tDen")
    val h1 = ref.select(refBucket.as("_b"), refCount.cast("long").as("_c"))
      .groupBy("_b").agg(sum("_c").cast("long").as("_cr"))
    val h2 = cur.select(curBucket.as("_b"), curCount.cast("long").as("_c"))
      .groupBy("_b").agg(sum("_c").cast("long").as("_cc"))
    val joined = h1.join(h2, Seq("_b"), "full")
      .select(coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_cc"), lit(0L)).as("_cc"))
    val totals = joined.agg(sum("_cr").cast("long").as("n_ref"),
      sum("_cc").cast("long").as("n_cur")) // 1 row
    joined.crossJoin(broadcast(totals))
      .groupBy()
      // coalesce: both frames empty → empty histogram → the global agg's
      // one row must read (0, 0, 0), not nulls
      .agg(coalesce(max("n_ref"), lit(0L)).as("n_ref"),
        coalesce(max("n_cur"), lit(0L)).as("n_cur"),
        coalesce(sum(abs(col("_cr") * col("n_cur") - col("_cc") * col("n_ref")))
          .cast("long"), lit(0L)).as("tvd_num"))
      .withColumn("_den", lit(2L) * col("n_ref") * col("n_cur"))
      // an empty side is full drift (all mass moved), both empty is none
      .withColumn("tvd_ppm",
        when(col("_den") === 0,
          when(col("n_ref") === col("n_cur"), 0L).otherwise(1000000L))
          .otherwise(expr(microRatioSql("tvd_num", "_den", "div"))))
      .drop("_den")
      .withColumn("drifted",
        col("tvd_ppm") * lit(tDen) > lit(tNum) * lit(1000000L))
  }
}
