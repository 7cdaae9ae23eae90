package graft.reddit

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Freezes engine sink shapes — column names, order, and dtypes — against
  * the reference's only correctness artifacts: its checked-in CSVs
  * (reference data/csv directory, per SURVEY.md §5.2). Each expected header
  * below is copied verbatim from the CSV (minus the pandas index column,
  * which the reference's `to_csv` emits unnamed and downstream readers
  * drop). A rename or reorder in these ops silently breaks anyone
  * replaying the reference's downstream notebooks on engine output.
  */
class GoldenShapeSpec extends SparkSpec {

  private lazy val games = RedditFixtures.games(spark)
  private lazy val comments = RedditFixtures.comments(spark)

  private def shape(df: DataFrame): Seq[(String, String)] =
    df.schema.map(f => f.name -> f.dataType.typeName).toSeq

  test("outcomeCounts == yankees_wl.csv header (Data_Gathering.py:238-240)") {
    // yankees_wl.csv: W/L,count
    assert(shape(RedditOps.outcomeCounts(games)) ==
      Seq("W/L" -> "string", "count" -> "long"))
  }

  test("commentLengthHistogram == hist_comment_length.csv header (NFL_Processing.py:56-77)") {
    // hist_comment_length.csv: ,comment_length,count,cum_count
    assert(shape(RedditOps.commentLengthHistogram(comments)) ==
      Seq("comment_length" -> "integer", "count" -> "long", "cum_count" -> "long"))
  }

  test("threadCommentCounts == all_game_thread_comments_count_yankees.csv header (NFL_Processing.py:273-283)") {
    // all_game_thread_comments_count_yankees.csv: ,title,count
    val joined = comments.withColumnRenamed("link_id", "lid")
      .withColumn("title", org.apache.spark.sql.functions.col("lid"))
    assert(shape(RedditOps.threadCommentCounts(joined, "title")) ==
      Seq("title" -> "string", "count" -> "long"))
  }

  test("commentStatsByOutcome == yankees_wl_comcount/avgcom.csv headers (Data_Gathering.py:238-284)") {
    // yankees_wl_comcount.csv: W/L,num_comments ; yankees_wl_avgcom.csv: W/L,avg_comments
    val joined = games.withColumn("num_comments",
      org.apache.spark.sql.functions.lit(3L))
    assert(shape(RedditOps.commentStatsByOutcome(joined)) ==
      Seq("W/L" -> "string", "num_comments" -> "long", "avg_comments" -> "double"))
  }

  test("mention counts == judge_sanchez_count.csv / aaron_judge_count.csv headers") {
    // judge_sanchez_count.csv: ,has_aaron_judge,has_gary_sanchez,count
    val m = RedditOps.withMentionDummies(comments, Map(
      "aaron_judge" -> "(?i)judge", "gary_sanchez" -> "(?i)sanchez"))
    assert(shape(RedditOps.mentionCrossTab(m, "aaron_judge", "gary_sanchez")) ==
      Seq("has_aaron_judge" -> "boolean", "has_gary_sanchez" -> "boolean",
        "count" -> "long"))
    // aaron_judge_count.csv: ,has_aaron_judge,count
    assert(shape(RedditOps.mentionCounts(m, "aaron_judge")) ==
      Seq("has_aaron_judge" -> "boolean", "count" -> "long"))
  }

  test("topTfidfTokens == top5_tfidfpd.csv header (NFL_Processing.py:504-513)") {
    // top5_tfidfpd.csv: ,title,Token,TF,IDF,TF-IDF,rank
    val withTitle = comments.withColumn("title",
      org.apache.spark.sql.functions.col("link_id"))
    val top = RedditOps.topTfidfTokens(withTitle, "title", 5)
    assert(shape(top) == Seq("title" -> "string", "Token" -> "string",
      "TF" -> "long", "IDF" -> "double", "TF-IDF" -> "double", "rank" -> "integer"))
    // and the k-bound holds per title
    import spark.implicits._
    val maxRank = top.groupBy("title")
      .agg(org.apache.spark.sql.functions.max($"rank")).collect().map(_.getInt(1)).max
    assert(maxRank <= 5)
  }
}
