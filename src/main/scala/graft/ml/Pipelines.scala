package graft.ml

import org.apache.spark.ml.classification.{LinearSVC, OneVsRest, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The reference's ML surface (SURVEY.md §2.11) as reusable pipeline
  * builders: feature indexing/encoding/assembly/scaling, RF + OvR-SVC
  * classifiers, GBT regressor (MLlib-native substitute for the reference's
  * XGBoost), CV harness, evaluators, correlation matrix, class weights,
  * confusion matrix.
  */
object Pipelines {

  /** StringIndexer(+OneHotEncoder) per categorical + VectorAssembler
    * (+ optional StandardScaler) — reference: code/ml/ML_Sentiment.py:162-181,
    * 370-380. */
  def featureStages(catCols: Seq[String], numCols: Seq[String],
                    scale: Boolean = false): Seq[PipelineStage] = {
    val indexers = catCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx").setHandleInvalid("keep"))
    val encoders = catCols.map(c =>
      new OneHotEncoder().setInputCol(s"${c}_idx").setOutputCol(s"${c}_oh"))
    val assembler = new VectorAssembler()
      .setInputCols((catCols.map(_ + "_oh") ++ numCols).toArray)
      .setOutputCol(if (scale) "features_raw" else "features")
    val scaler =
      if (scale) Seq(new StandardScaler().setInputCol("features_raw")
        .setOutputCol("features").setWithMean(true).setWithStd(true))
      else Seq.empty
    indexers ++ encoders ++ Seq(assembler) ++ scaler
  }

  /** Inverse-frequency class weights (the reference hard-codes
    * 0.934/6.50/0.56 — code/ml/ML_Sentiment.py:119-121; we derive them).
    * One aggregation pass: n and k come from windows over the tiny
    * per-class count frame, not separate count()/distinct() jobs. */
  def withClassWeights(df: DataFrame, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val freqs = df.groupBy(labelCol).agg(count(lit(1)).as("cnt"))
      .withColumn("weight",
        sum(col("cnt")).over(all).cast("double")
          / (count(lit(1)).over(all) * col("cnt")))
      .select(col(labelCol), col("weight"))
    df.join(broadcast(freqs), Seq(labelCol))
  }

  /** MLlib hashed-features TF-IDF: HashingTF → IDF over a pre-tokenized
    * array column — the reference's declared MLlib alternative to its
    * hand-rolled TF-IDF (code/nlp/NFL_Processing.py:421-431; SURVEY
    * §2.10). Hashing needs no vocabulary fit, so at 100 TB it is a pure
    * map-side stage: fixed 2^18 feature space, no driver-held dictionary. */
  def hashedTfIdfStages(tokensCol: String,
                        numFeatures: Int = 1 << 18): Seq[PipelineStage] = Seq(
    new HashingTF().setInputCol(tokensCol).setOutputCol("tf_features")
      .setNumFeatures(numFeatures),
    new IDF().setInputCol("tf_features").setOutputCol("features"))

  /** CountVectorizer → IDF variant: exact vocabulary (one distributed fit
    * pass, vocab broadcast to executors) where reversible feature indices
    * matter more than the hashing trick's fixed memory. */
  def countVectorizedStages(tokensCol: String, vocabSize: Int = 1 << 16,
                            minDF: Double = 1.0): Seq[PipelineStage] = Seq(
    new CountVectorizer().setInputCol(tokensCol).setOutputCol("tf_features")
      .setVocabSize(vocabSize).setMinDF(minDF),
    new IDF().setInputCol("tf_features").setOutputCol("features"))

  /** RF classifier (reference: 2000 trees entropy; sized down-callable). */
  def rfClassifier(labelCol: String, numTrees: Int = 50,
                   weightCol: Option[String] = None): RandomForestClassifier = {
    val rf = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setNumTrees(numTrees).setImpurity("entropy").setSeed(42)
    weightCol.foreach(rf.setWeightCol)
    rf
  }

  /** One-vs-rest LinearSVC (code/ml/ML_Sentiment.py:385). */
  def ovrLinearSvc(labelCol: String): OneVsRest =
    new OneVsRest().setLabelCol(labelCol).setFeaturesCol("features")
      .setClassifier(new LinearSVC().setMaxIter(20))

  /** GBT regressor — MLlib-native stand-in for SparkXGBRegressor
    * (code/ml/ML_Modeling.py:202-207). Same model family (gradient-
    * boosted trees over the assembled feature vector), same tunables —
    * the CV grid sweeps maxDepth × maxIter exactly as the reference
    * sweeps max_depth × n_estimators, seed 42 both sides. A drop-in
    * XGBoost4J-Spark backend behind this method is the one sanctioned
    * closer-parity option (same `Predictor` seam, `xgboost4j-spark`'s
    * `XGBoostRegressor` is API-compatible with the CV harness), but the
    * build is zero-egress and XGBoost4J ships native binaries that are
    * not in the vendored Spark jars — an optional dependency would fail
    * to resolve here by design, so MLlib GBT stays the implementation
    * per SURVEY §2.11. */
  def gbtRegressor(labelCol: String): GBTRegressor =
    new GBTRegressor().setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(10).setSeed(42)

  /** 4-fold CV + grid (depth × trees), the reference's tuning harness
    * (code/ml/ML_Modeling.py:210-232). */
  def crossValidateGbt(stages: Seq[PipelineStage], labelCol: String,
                       folds: Int = 4): CrossValidator = {
    val gbt = gbtRegressor(labelCol)
    val grid = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, Array(3, 5))
      .addGrid(gbt.maxIter, Array(5, 10))
      .build()
    new CrossValidator()
      .setEstimator(new Pipeline().setStages((stages :+ gbt).toArray))
      .setEvaluator(new RegressionEvaluator().setLabelCol(labelCol).setMetricName("rmse"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(folds)
      .setSeed(42)
  }

  def rmse(labelCol: String): RegressionEvaluator =
    new RegressionEvaluator().setLabelCol(labelCol).setMetricName("rmse")

  def accuracy(labelCol: String): MulticlassClassificationEvaluator =
    new MulticlassClassificationEvaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction").setMetricName("accuracy")

  def f1(labelCol: String): MulticlassClassificationEvaluator =
    new MulticlassClassificationEvaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction").setMetricName("f1")

  /** Decode predicted label indices back to their string values
    * (IndexToString, code/ml/ML_Sentiment.py:189-191). */
  def labelDecoder(labels: Array[String]): IndexToString =
    new IndexToString().setInputCol("prediction")
      .setOutputCol("predicted_label").setLabels(labels)

  /** VectorIndexer stage for auto-detecting categorical features inside an
    * assembled vector (maxCategories per the reference,
    * code/ml/ML_Modeling.py:198,310). */
  def vectorIndexer(inputCol: String = "features",
                    outputCol: String = "features_indexed",
                    maxCategories: Int = 999): VectorIndexer =
    new VectorIndexer().setInputCol(inputCol).setOutputCol(outputCol)
      .setMaxCategories(maxCategories)

  /** Pearson correlation matrix over numeric columns
    * (code/ml/feature_correlation.py:41-49). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): Matrix = {
    val assembled = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("corr_features").transform(df.select(cols.map(col): _*))
    Correlation.corr(assembled, "corr_features").head.getAs[Matrix](0)
  }

  /** Confusion matrix as an in-engine cross-tab
    * (code/ml/ML_Modeling.py:410 kept distributed, SURVEY §2.11). */
  def confusionMatrix(pred: DataFrame, labelCol: String,
                      classes: Seq[String]): DataFrame =
    Relational.crossTab(
      pred.withColumn("pred_str", col("prediction").cast("int").cast("string")),
      col(labelCol).cast("int").cast("string").as("label"),
      col("pred_str"), classes)
}
