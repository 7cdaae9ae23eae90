package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{IsotonicRegression, IsotonicRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Score calibration — the step between a raw scorer (reward model,
  * quality classifier, annotator-agreement rate) and anything that
  * treats its output as a PROBABILITY (sampling temperatures, acceptance
  * thresholds, mixture weights). Raw scores rank well but are rarely
  * calibrated; isotonic regression (PAVA) fits the best monotone map
  * score → P(label) without assuming a parametric shape — the standard
  * non-parametric calibrator (Zadrozny & Elkan 2002), and the form used
  * to calibrate reward-model scores against held-out preference
  * outcomes.
  *
  * Built on Spark ML's `IsotonicRegression` (distributed PAVA: per-
  * partition pools merged on the driver; the MODEL is boundary/
  * prediction arrays — bounded by the number of violator pools, not
  * rows). Same seam discipline as the rest of `graft.ml`: the fitted
  * model is a plain Spark ML artifact (persistable via its own
  * save/load like the reference's pipeline models).
  */
object Calibration {

  /** Fit score → P(label) on (score, binary-or-rate label) pairs.
    * Null/NaN scores or labels carry no calibration evidence and are
    * dropped from the fit (the assembler's `skip` mode) — the fit never
    * throws on the stray null row the rest of the framework tolerates. */
  def fitIsotonic(df: DataFrame, scoreCol: Column, labelCol: Column):
      IsotonicRegressionModel = {
    val prepped = df.select(scoreCol.cast("double").as("raw_score"),
      labelCol.cast("double").as("label"))
      .filter(col("label").isNotNull && !isnan(col("label")))
    val assembled = new VectorAssembler()
      .setInputCols(Array("raw_score")).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(prepped)
    new IsotonicRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setIsotonic(true)
      .fit(assembled)
  }

  /** EXACT isotonic fit over BINNED integer scores — the oracle-tier
    * twin of [[fitIsotonic]] (whose distributed PAVA merges pools on
    * the driver in a sequence no external engine can replay). Uses the
    * minimax identity instead of the merge order: the isotonic
    * least-squares fit at bin i equals
    *   fit_i = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k)
    * (Barlow et al. 1972, eq. 1.9–1.13) — a closed form over prefix
    * sums, no sequential state, so any engine reproduces it from the
    * same histogram. Every candidate mean is ONE IEEE division of
    * exact longs (correctly rounded, hence monotone), so min/max over
    * them equals the rounded true minimax: the released doubles are
    * bit-identical across engines AND to the exact-rational PAVA
    * result rounded once (`CalibrationSpec` pins fit == plain-Scala
    * rational PAVA on fixtures, and monotonicity).
    *
    * Scale shape: scores must be integer-binned (the [[Eval.aucExact]]
    * measurement contract — real scores quantize first). One corpus-
    * scale map-side-combinable aggregation to the B-bin histogram;
    * the prefix window and the O(B³) join pyramid run on bins only —
    * B is bounded by the score domain, NOT the corpus, and the join
    * sides are broadcast. Keep B ≤ ~500 (B³ ≈ 2·10⁷ transient rows);
    * beyond that, use [[fitIsotonic]] and accept driver-merge PAVA.
    *
    * Output: one row per bin — (s, ynum, yden, fit) where fit is the
    * calibrated P(label=1 | score bin). Null scores/labels carry no
    * calibration evidence and are dropped (the [[fitIsotonic]]
    * discipline). */
  def isotonicBinned(df: DataFrame, scoreCol: Column,
                     labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = df.select(scoreCol.cast("long").as("s"),
        labelCol.cast("long").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(sum("y").as("ynum"), count(lit(1)).as("yden"))
    // histogram-sized unpartitioned window — the aucExact argument
    val w = Window.orderBy("s")
    val cum = bins.withColumn("rn", row_number().over(w))
      .withColumn("cnum", sum("ynum").over(w))
      .withColumn("cden", sum("yden").over(w))
    val zero = bins.sparkSession.range(1).select(
      lit(0L).as("pj"), lit(0L).as("pnum"), lit(0L).as("pden"))
    val pre = cum.select(col("rn").cast("long").as("pj"),
        col("cnum").as("pnum"), col("cden").as("pden"))
      .unionByName(zero)
    val ks = cum.select(col("rn").cast("long").as("k"),
      col("cnum").as("knum"), col("cden").as("kden"))
    // j ≤ i ⇔ pj = j−1 < i; k ≥ i (and k ≥ j holds transitively)
    val pairs = cum.select(col("rn").cast("long").as("i"), col("s"),
        col("ynum"), col("yden"))
      .join(broadcast(pre), col("pj") < col("i"))
      .join(broadcast(ks), col("k") >= col("i"))
      .withColumn("a", (col("knum") - col("pnum")).cast("double") /
        (col("kden") - col("pden")).cast("double"))
    pairs.groupBy("i", "s", "ynum", "yden", "pj").agg(min("a").as("ma"))
      .groupBy("i", "s", "ynum", "yden").agg(max("ma").as("fit"))
      .select("s", "ynum", "yden", "fit")
  }

  /** Apply a fitted calibrator: adds `calibrated` next to the raw score
    * column (linear interpolation between fitted boundaries — Spark
    * ML's transform contract). Operates on a COPY of the model (the
    * caller's instance keeps its own column settings — a shared fitted
    * model must not change behavior because someone calibrated with
    * it). Null scores pass through with a null `calibrated` — the
    * poison discipline, not a crash. */
  def calibrate(model: IsotonicRegressionModel, df: DataFrame,
                scoreCol: Column): DataFrame = {
    val withFeatures = new VectorAssembler()
      .setInputCols(Array("__cal_in")).setOutputCol("__cal_features")
      .setHandleInvalid("keep") // null score -> NaN feature, nullified below
      .transform(df.withColumn("__cal_in", scoreCol.cast("double")))
    model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("__cal_features").setPredictionCol("__cal_raw")
      .transform(withFeatures)
      .withColumn("calibrated",
        when(col("__cal_in").isNull || isnan(col("__cal_in")),
          lit(null).cast("double")).otherwise(col("__cal_raw")))
      .drop("__cal_in", "__cal_features", "__cal_raw")
  }
}
