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

  /** Fit score → P(label) on (score, binary-or-rate label) pairs. */
  def fitIsotonic(df: DataFrame, scoreCol: Column, labelCol: Column):
      IsotonicRegressionModel = {
    val prepped = df.select(scoreCol.cast("double").as("raw_score"),
      labelCol.cast("double").as("label"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("raw_score")).setOutputCol("features")
      .transform(prepped)
    new IsotonicRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setIsotonic(true)
      .fit(assembled)
  }

  /** Apply a fitted calibrator: adds `calibrated` next to the raw score
    * column (linear interpolation between fitted boundaries — Spark
    * ML's transform contract). */
  def calibrate(model: IsotonicRegressionModel, df: DataFrame,
                scoreCol: Column): DataFrame = {
    val withFeatures = new VectorAssembler()
      .setInputCols(Array("__cal_in")).setOutputCol("__cal_features")
      .transform(df.withColumn("__cal_in", scoreCol.cast("double")))
    model.setFeaturesCol("__cal_features").setPredictionCol("calibrated")
      .transform(withFeatures)
      .drop("__cal_in", "__cal_features")
  }
}
