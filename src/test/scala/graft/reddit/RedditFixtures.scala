package graft.reddit

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic Reddit-shaped fixtures (FIXTURES.md): the reference's
  * real Pushshift inputs are unreachable, so golden tests run on this
  * synthetic corpus, seeded and reproducible. */
object RedditFixtures {

  private val subs = Seq("nba", "nfl", "NYYankees", "Commanders", "baseball", "hockey")
  private val seasonDates: Seq[LocalDate] = {
    val start = LocalDate.of(2021, 4, 1)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(LocalDate.of(2021, 10, 4))).toSeq
  }
  val postponedIds = Seq("post01", "post02", "post03")

  private def utc(d: LocalDate, hour: Int): Long =
    d.atStartOfDay(java.time.ZoneOffset.UTC).plusHours(hour).toEpochSecond

  def submissions(spark: SparkSession, n: Int = 3000): DataFrame = {
    val rng = new scala.util.Random(42)
    val regular = (0 until n).map { i =>
      val r = rng.nextInt(64) // Zipfian-ish skew: nba ~50%, tail rare
      val sub = subs(
        if (r < 32) 0 else if (r < 48) 1 else if (r < 56) 2
        else if (r < 60) 3 else if (r < 62) 4 else 5)
      val d = seasonDates(rng.nextInt(seasonDates.size))
      Row(f"id$i%06d", sub, s"t5_$sub", if (rng.nextInt(20) == 0) "[deleted]" else s"user${rng.nextInt(300)}",
        s"Post $i about $sub", s"selftext $i",
        if (rng.nextInt(7) == 0) s"https://youtube.com/watch?v=$i" else s"https://example.com/$i",
        "example.com", utc(d, rng.nextInt(24)), rng.nextInt(5000).toLong,
        rng.nextInt(400).toLong, rng.nextInt(3).toLong, rng.nextInt(2).toLong,
        rng.nextInt(20) == 0, false, true, false, false, false, false,
        "false", null, "all_ads", s"/r/$sub/$i", utc(d, 23),
        if (rng.nextInt(10) == 0) Seq(Row(s"xp$i", sub, rng.nextInt(100).toLong)) else Seq.empty[Row])
    }
    // one Yankeebot game thread per season date (+ postponed dups to exclude)
    val threads = seasonDates.zipWithIndex.map { case (d, i) =>
      Row(f"gt$i%06d", "NYYankees", "t5_NYYankees", "Yankeebot",
        s"Game Thread: Yankees vs Opponent ($d)", "", s"https://example.com/gt$i",
        "self.NYYankees", utc(d, 17), 500L, 3000L, 0L, 1L,
        false, false, true, false, true, false, false,
        "false", null, "all_ads", s"/r/NYYankees/gt$i", utc(d, 23), Seq.empty[Row])
    } ++ postponedIds.zipWithIndex.map { case (id, i) =>
      val d = seasonDates(10 + i)
      Row(id, "NYYankees", "t5_NYYankees", "Yankeebot",
        s"Game Thread: Yankees vs Opponent ($d) POSTPONED", "", s"https://example.com/$id",
        "self.NYYankees", utc(d, 15), 100L, 50L, 0L, 0L,
        false, false, true, false, true, false, false,
        "false", null, "all_ads", s"/r/NYYankees/$id", utc(d, 23), Seq.empty[Row])
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(regular ++ threads, 4), RedditSchema.submissions)
  }

  def comments(spark: SparkSession, perThread: Int = 40): DataFrame = {
    val rng = new scala.util.Random(7)
    val words = Seq("go", "yankees", "great", "play", "judge", "wow", "bad", "call",
      "aaron", "judge", "all", "rise", "gary", "sanchez", "kraken", "inning")
    val rows = seasonDates.zipWithIndex.flatMap { case (d, i) =>
      (0 until perThread).map { j =>
        val body = (0 until (3 + rng.nextInt(12)))
          .map(_ => words(rng.nextInt(words.size))).mkString(" ")
        Row(s"user${rng.nextInt(500)}", false, null, null, body, true,
          rng.nextInt(2).toLong, utc(d, 17) + j * 60L, null, "false",
          0L, f"c$i%04d$j%04d", false, f"t3_gt$i%06d", f"t3_gt$i%06d",
          s"/r/NYYankees/c$i$j", utc(d, 23), rng.nextInt(100).toLong - 5,
          false, "NYYankees", "t5_NYYankees")
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), RedditSchema.comments)
  }

  def games(spark: SparkSession): DataFrame = {
    val rng = new scala.util.Random(11)
    val rows = seasonDates.zipWithIndex.map { case (d, i) =>
      val wl = Seq("W", "L", "W", "L", "W-wo", "L-wo")(rng.nextInt(6))
      Row((i + 1).toLong, d.toString, "NYY", if (i % 2 == 0) "@" else null, "OPP",
        wl, rng.nextInt(12).toLong, rng.nextInt(12).toLong, 9.0,
        (1 + rng.nextInt(5)).toLong, s"${2 + rng.nextInt(2)}:${10 + rng.nextInt(49)}",
        if (rng.nextInt(3) == 0) "D" else "N", 30000.0 + rng.nextInt(15000),
        Timestamp.valueOf(d.atStartOfDay()))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), RedditSchema.games)
  }
}
