package graft.reddit

import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.Pipelines
import graft.text.TextAnalysis

/** The reference's ten business questions (reference:
  * code/eda/project_eda.py:12-52) as named, end-to-end query definitions —
  * the acceptance suite of SURVEY.md §7, composed entirely from the
  * engine's operator modules.
  */
object TenQuestions {

  /** Q1 — are media posts more popular? Avg score by video flag. */
  def q1MediaPopularity(submissions: DataFrame): DataFrame =
    RedditOps.withVideoFlag(submissions)
      .groupBy("video")
      .agg(count(lit(1)).as("n_posts"), round(avg(col("score")), 2).as("avg_score"))

  /** Q2 — crossposts vs popularity: Pearson corr for all posts and for
    * popular (score≥500) posts (project_eda.py:224-232). */
  def q2CrosspostCorrelation(submissions: DataFrame): DataFrame = {
    val all = submissions.stat.corr("num_crossposts", "score")
    val popular = submissions.filter(col("score") >= 500)
      .stat.corr("num_crossposts", "score")
    val spark = submissions.sparkSession
    import spark.implicits._
    Seq(("all_posts", all), ("popular_posts", popular))
      .toDF("cohort", "corr_crossposts_score")
  }

  /** Q3 — does past success predict success? Correlate the per-author
    * running aggregate score with the post score (project_eda.py:479-522). */
  def q3PastSuccess(submissions: DataFrame): DataFrame = {
    val run = RedditOps.authorRunningStats(submissions)
    val c = run.stat.corr("aggregate_score", "score")
    val spark = submissions.sparkSession
    import spark.implicits._
    Seq(("corr_aggregate_score_vs_score", c)).toDF("metric", "value")
  }

  /** Q4 — ad status (whitelist_status) vs score. */
  def q4AdStatus(submissions: DataFrame): DataFrame =
    submissions.groupBy("whitelist_status")
      .agg(count(lit(1)).as("n_posts"), round(avg(col("score")), 2).as("avg_score"))

  /** Q5 — gilded vs score: per-gilded-count averages + scalar corr. */
  def q5GildedEffect(submissions: DataFrame): DataFrame =
    submissions.groupBy("gilded")
      .agg(count(lit(1)).as("n_posts"), round(avg(col("score")), 2).as("avg_score"))
      .withColumn("corr_gilded_score",
        round(lit(submissions.stat.corr("gilded", "score")), 4))

  /** Q6 — post-time distributions per subreddit (time_slot × dayofweek). */
  def q6TimeDistributions(submissions: DataFrame): DataFrame =
    RedditOps.withTimeFeatures(submissions, col("created_utc"))
      .groupBy("subreddit", "time_slot", "dayofweek")
      .agg(count(lit(1)).as("n_posts"), round(avg(col("score")), 2).as("avg_score"))

  /** Q7 — positive/negative comment ratio per subreddit (lexicon scorer
    * standing in for the pretrained model, SURVEY §2.10). */
  def q7SentimentBySubreddit(comments: DataFrame): DataFrame =
    TextAnalysis.withSentiment(comments, col("body"))
      .groupBy("subreddit", "sentiment").agg(count(lit(1)).as("n"))

  /** Q8 — sentiment by time slot within a subreddit. */
  def q8SentimentByTimeSlot(comments: DataFrame): DataFrame =
    RedditOps.withTimeFeatures(
      TextAnalysis.withSentiment(comments, col("body")), col("created_utc"))
      .groupBy("time_slot", "sentiment").agg(count(lit(1)).as("n"))

  /** Q9 — does team performance drive activity? Comment volume per
    * game outcome over the joined game/thread/comment chain. */
  def q9PerformanceActivity(games: DataFrame, threads: DataFrame): DataFrame =
    RedditOps.commentStatsByOutcome(
      RedditOps.joinGamesToThreads(games, threads))

  /** Q10 — predict post score from EDA features with the ML pipeline
    * (GBT regressor as the XGBoost stand-in). Returns per-cohort RMSE. */
  def q10ScoreModel(submissions: DataFrame): DataFrame = {
    val data = RedditOps.withTimeFeatures(
      RedditOps.withVideoFlag(submissions), col("created_utc"))
      .select(col("score").cast("double").as("score"),
        col("video").cast("double"), col("num_comments").cast("double"),
        col("num_crossposts").cast("double"), col("gilded").cast("double"),
        col("time_of_day"), col("is_weekday"))
    val stages = Pipelines.featureStages(
      Seq("time_of_day", "is_weekday"),
      Seq("video", "num_comments", "num_crossposts", "gilded"))
    val Array(train, test) = data.randomSplit(Array(0.75, 0.25), seed = 42)
    val model = new Pipeline()
      .setStages((stages :+ Pipelines.gbtRegressor("score")).toArray).fit(train)
    val rmse = Pipelines.rmse("score").evaluate(model.transform(test))
    val sd = test.agg(stddev_pop(col("score"))).head.getDouble(0)
    val spark = submissions.sparkSession
    import spark.implicits._
    Seq(("rmse_test", rmse), ("score_sd_baseline", sd)).toDF("metric", "value")
  }
}
