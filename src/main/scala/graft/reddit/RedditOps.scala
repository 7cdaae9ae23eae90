package graft.reddit

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Buckets
import graft.operators.Relational

/** The reference's business queries (SURVEY.md §7 "queries/": the ten
  * questions of project_eda.py:12-52 plus the Data_Gathering/NLP chains)
  * as named, reusable operators — UDF-free and broadcast-aware, so every
  * plan stays codegen'd and pushdown-friendly (SURVEY.md §3 E1/E2).
  */
object RedditOps {

  /** Q-top-subreddits (reference: code/project_starter_script.py:80-94).
    * TakeOrderedAndProject, not a global sort + driver slice. */
  def topSubreddits(submissions: DataFrame, n: Int): DataFrame =
    submissions.groupBy("subreddit").count()
      .orderBy(col("count").desc, col("subreddit")).limit(n)

  /** Video-post flag from url regex + is_video (project_eda.py:253). */
  def withVideoFlag(submissions: DataFrame): DataFrame =
    submissions.withColumn("video",
      (col("url").rlike("(?i)youtube|youtu.be|mp4|mov|streamable") || col("is_video"))
        .cast("int"))

  /** EST-shifted datetime + all four time buckets + day-name/month
    * (project_eda.py:286, 331-333, 685-717) — when-chains, no UDFs. */
  def withTimeFeatures(df: DataFrame, createdUtc: Column): DataFrame = {
    val est = from_unixtime(createdUtc).cast("timestamp") - expr("INTERVAL 5 HOURS")
    df.withColumn("datetime", est)
      .withColumn("time_of_day", Buckets.timeOfDay(hour(col("datetime"))))
      .withColumn("is_weekday", Buckets.isWeekday(dayofweek(col("datetime"))))
      .withColumn("season", Buckets.season(month(col("datetime"))))
      .withColumn("time_slot", Buckets.timeSlot(hour(col("datetime"))))
      .withColumn("dayofweek", date_format(col("datetime"), "E"))
      .withColumn("post_month", date_format(col("datetime"), "MMMM"))
  }

  /** Average score per time bucket (project_eda.py:283-352). */
  def avgScoreByBucket(submissions: DataFrame, bucket: String): DataFrame =
    withTimeFeatures(submissions, col("created_utc"))
      .groupBy(bucket).agg(avg(col("score")).as("avg_score"))

  /** Per-author running score sum + post count, RANGE frame, `[deleted]`
    * excluded (project_eda.py:479-510 W1/W2). */
  def authorRunningStats(submissions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("author")).orderBy(col("created_utc"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    submissions.filter(col("author") =!= "[deleted]")
      .select(col("author"), col("created_utc"), col("score"),
        sum(col("score")).over(w).as("aggregate_score"),
        count(col("score")).over(w).as("num_posts"))
  }

  /** The Data_Gathering.py:33-88 game-thread chain: subreddit + bot author
    * equality, season timestamp range, "Game Thread" regex, and an
    * id-exclusion list (the reference's 8 chained `!=` filters collapse to
    * one NOT IN, same semantics, one predicate for pushdown). */
  def gameThreads(submissions: DataFrame, subreddit: String, botAuthor: String,
                  seasonStart: String, seasonEnd: String,
                  excludedIds: Seq[String]): DataFrame =
    submissions
      .filter(col("subreddit") === subreddit && col("author") === botAuthor)
      .withColumn("created_ts", from_unixtime(col("created_utc")).cast("timestamp"))
      .filter(col("created_ts") > unix_timestamp(lit(seasonStart)).cast("timestamp")
        && col("created_ts") < unix_timestamp(lit(seasonEnd)).cast("timestamp"))
      .filter(col("title").rlike("Game Thread:*."))
      .filter(!col("id").isin(excludedIds: _*))
      .withColumn("date_val", to_date(col("created_ts")))

  /** J1: game records ⋈ thread dates — the 154-row dimension side is
    * explicitly broadcast (Data_Gathering.py:141-155). */
  def joinGamesToThreads(games: DataFrame, threads: DataFrame): DataFrame =
    threads.join(broadcast(games),
      games("New_Date") === threads("date_val"), "inner")

  /** J2: thread dimension ⋈ comments fact on synthesized link id
    * (Data_Gathering.py:165-214) — broadcast of the small side is what
    * the reference's "absurdly long" join was missing at scale. */
  def joinCommentsByLinkId(threadsWithGames: DataFrame, comments: DataFrame): DataFrame = {
    val dim = threadsWithGames.withColumn("link_id_t", concat(lit("t3_"), col("id")))
    comments.join(broadcast(dim), comments("link_id") === dim("link_id_t"), "inner")
  }

  /** Walk-off aggregation into W/L (Cleaning&Prepping_Data_ML.py:38:
    * W|W-wo → W, everything else → L — including the reference's
    * collapsing of L-wo via the otherwise branch). */
  def walkoffCollapsed: Column =
    when(col("`W/L`") === "W" || col("`W/L`") === "W-wo", "W").otherwise("L")

  /** Comment length + game features over quoted column names
    * (Cleaning&Prepping_Data_ML.py:38-48). */
  def withGameFeatures(df: DataFrame): DataFrame =
    df.withColumn("wl", walkoffCollapsed)
      .withColumn("comment_length", length(col("body")))
      .withColumn("game_location",
        when(col("`Unnamed: 4`") === "@", "home").otherwise("away"))
      .withColumn("game_length",
        regexp_replace(col("Time"), ":", ".").cast("float"))

  /** W/L distribution in the reference's sink shape
    * (Data_Gathering.py:238-284 → data/csv/yankees_wl.csv: W/L,count). */
  def outcomeCounts(games: DataFrame): DataFrame =
    games.groupBy(col("`W/L`")).count()

  /** Comment volume + average per outcome; column names match the
    * reference's two sinks (yankees_wl_comcount.csv: W/L,num_comments and
    * yankees_wl_avgcom.csv: W/L,avg_comments — each a projection of this). */
  def commentStatsByOutcome(joined: DataFrame): DataFrame =
    joined.groupBy(col("`W/L`"))
      .agg(sum(col("num_comments")).as("num_comments"),
        avg(col("num_comments")).as("avg_comments"))

  /** Single-mention counts (aaron_judge_count.csv: has_<name>,count). */
  def mentionCounts(df: DataFrame, name: String): DataFrame =
    df.groupBy(s"has_$name").count()

  /** Player-mention dummies (Yankees_Processing_with_NLP.py:695-744):
    * case-insensitive alternation regex per player + cross-tab counts. */
  def withMentionDummies(comments: DataFrame, mentions: Map[String, String]): DataFrame =
    mentions.foldLeft(comments) { case (df, (name, pattern)) =>
      df.withColumn(s"has_$name", col("body").rlike(pattern))
    }

  def mentionCrossTab(df: DataFrame, a: String, b: String): DataFrame =
    df.groupBy(s"has_$a", s"has_$b").count()

  /** Comment word-count histogram + cumulative sum, in the reference's
    * sink shape (NFL_Processing.py:35-77 →
    * data/csv/hist_comment_length.csv: comment_length,count,cum_count). */
  def commentLengthHistogram(comments: DataFrame): DataFrame =
    Relational.histogramWithCumsum(
        comments, size(split(col("body"), " ")), "comment_length")
      .withColumnRenamed("n", "count")
      .withColumnRenamed("cum_n", "cum_count")

  /** Per-thread comment counts, busiest first (NFL_Processing.py:273-283
    * → data/csv/all_*_comments_count.csv shape). */
  def threadCommentCounts(joined: DataFrame, titleCol: String): DataFrame =
    joined.groupBy(col(titleCol).as("title")).count()
      .orderBy(col("count").desc, col("title"))

  /** Top-k TF-IDF tokens per thread in the reference's sink shape
    * (NFL_Processing.py:504-513 → data/csv/top5_tfidfpd.csv:
    * title,Token,TF,IDF,TF-IDF,rank). */
  def topTfidfTokens(comments: DataFrame, titleCol: String, k: Int): DataFrame =
    graft.text.TfIdf.topKPerDoc(comments, col(titleCol),
        graft.functions.TextFunctions.tokens(lower(col("body"))), k)
      .select(col("doc").as("title"), col("token").as("Token"),
        col("tf").as("TF"), col("idf").as("IDF"),
        col("tfidf").as("TF-IDF"), col("rnk").as("rank"))
}
