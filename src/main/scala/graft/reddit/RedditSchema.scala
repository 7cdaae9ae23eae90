package graft.reddit

import org.apache.spark.sql.types._

/** Explicit schemas for the Reddit-shaped corpus (SURVEY.md §1) — the
  * engine declares its sources (no inference in the engine path).
  * Submissions carry the exercised subset of the 70-column Pushshift
  * schema, including a nested array<struct> to keep the nested-type path
  * honest (reference: printSchema in project_eda.ipynb). Comments carry
  * the full 21 columns (rename map at code/nlp/Data_Gathering.py:211).
  */
object RedditSchema {

  val crosspostEntry: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("subreddit", StringType),
    StructField("score", LongType)))

  val submissions: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("subreddit", StringType),
    StructField("subreddit_id", StringType),
    StructField("author", StringType),
    StructField("title", StringType),
    StructField("selftext", StringType),
    StructField("url", StringType),
    StructField("domain", StringType),
    StructField("created_utc", LongType),
    StructField("score", LongType),
    StructField("num_comments", LongType),
    StructField("num_crossposts", LongType),
    StructField("gilded", LongType),
    StructField("is_video", BooleanType),
    StructField("is_reddit_media_domain", BooleanType),
    StructField("is_self", BooleanType),
    StructField("over_18", BooleanType),
    StructField("stickied", BooleanType),
    StructField("spoiler", BooleanType),
    StructField("locked", BooleanType),
    StructField("edited", StringType),
    StructField("distinguished", StringType),
    StructField("whitelist_status", StringType),
    StructField("permalink", StringType),
    StructField("retrieved_on", LongType),
    StructField("crosspost_parent_list", ArrayType(crosspostEntry))))

  val comments: StructType = StructType(Seq(
    StructField("author", StringType),
    StructField("author_cakeday", BooleanType),
    StructField("author_flair_css_class", StringType),
    StructField("author_flair_text", StringType),
    StructField("body", StringType),
    StructField("can_gild", BooleanType),
    StructField("controversiality", LongType),
    StructField("created_utc", LongType),
    StructField("distinguished", StringType),
    StructField("edited", StringType),
    StructField("gilded", LongType),
    StructField("id", StringType),
    StructField("is_submitter", BooleanType),
    StructField("link_id", StringType),
    StructField("parent_id", StringType),
    StructField("permalink", StringType),
    StructField("retrieved_on", LongType),
    StructField("score", LongType),
    StructField("stickied", BooleanType),
    StructField("subreddit", StringType),
    StructField("subreddit_id", StringType)))

  /** External baseball-reference game table — note the non-identifier
    * column names (`W/L`, `Gm#`, `Unnamed: 4`) the engine must quote
    * through the whole ML path (SURVEY.md §1). */
  val games: StructType = StructType(Seq(
    StructField("Gm#", LongType),
    StructField("Date", StringType),
    StructField("Tm", StringType),
    StructField("Unnamed: 4", StringType),
    StructField("Opp", StringType),
    StructField("W/L", StringType),
    StructField("R", LongType),
    StructField("RA", LongType),
    StructField("Inn", DoubleType),
    StructField("Rank", LongType),
    StructField("Time", StringType),
    StructField("D/N", StringType),
    StructField("Attendance", DoubleType),
    StructField("New_Date", TimestampType)))
}
