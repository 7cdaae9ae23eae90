package graft.reddit

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Acceptance suite: the ten reference business questions run end-to-end
  * on the synthetic fixtures (SURVEY.md §7). */
class TenQuestionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val submissions = RedditFixtures.submissions(spark).cache()
  lazy val comments = RedditFixtures.comments(spark).cache()
  lazy val games = RedditFixtures.games(spark).cache()
  lazy val threads = RedditOps.gameThreads(submissions, "NYYankees", "Yankeebot",
    "2021-04-01 00:00:00", "2021-10-05 00:00:00", RedditFixtures.postponedIds)

  test("Q1 media popularity: both cohorts present with averages") {
    val r = TenQuestions.q1MediaPopularity(submissions).collect()
    assert(r.map(_.getInt(0)).toSet == Set(0, 1))
  }

  test("Q2 crosspost correlation: finite values for both cohorts") {
    val r = TenQuestions.q2CrosspostCorrelation(submissions).collect()
    assert(r.length == 2 && r.forall(x => !x.getDouble(1).isNaN))
  }

  test("Q3 past success: correlation is finite and positive-leaning") {
    val v = TenQuestions.q3PastSuccess(submissions).head.getDouble(1)
    assert(!v.isNaN && v > -1 && v < 1)
  }

  test("Q4 ad status breakdown covers all rows") {
    val r = TenQuestions.q4AdStatus(submissions)
    assert(r.agg(sum("n_posts")).head.getLong(0) == submissions.count())
  }

  test("Q5 gilded effect: corr column constant and finite") {
    val r = TenQuestions.q5GildedEffect(submissions)
    assert(r.select("corr_gilded_score").distinct().count() == 1)
  }

  test("Q6 time distributions: all slots bucketed") {
    val r = TenQuestions.q6TimeDistributions(submissions)
    assert(r.agg(sum("n_posts")).head.getLong(0) == submissions.count())
    assert(r.filter(col("time_slot") === "0").count() == 0)
  }

  test("Q7 sentiment by subreddit: labels partition the comments") {
    val r = TenQuestions.q7SentimentBySubreddit(comments)
    assert(r.agg(sum("n")).head.getLong(0) == comments.count())
  }

  test("Q8 sentiment by time slot partitions the comments") {
    val r = TenQuestions.q8SentimentByTimeSlot(comments)
    assert(r.agg(sum("n")).head.getLong(0) == comments.count())
  }

  test("Q9 performance vs activity: every outcome has volume stats") {
    val r = TenQuestions.q9PerformanceActivity(games, threads).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => !x.isNullAt(1) && !x.isNullAt(2)))
  }

  test("Q10 score model: GBT beats the sd baseline on held-out data") {
    val r = TenQuestions.q10ScoreModel(submissions).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("rmse_test") < r("score_sd_baseline"),
      s"rmse ${r("rmse_test")} vs sd ${r("score_sd_baseline")}")
  }
}
