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
