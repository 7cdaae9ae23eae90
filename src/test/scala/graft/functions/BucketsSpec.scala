package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(hours: Seq[Int], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] =
    hours.toDF("h").select(f(col("h")).as("v")).collect().map(_.getString(0)).toSeq

  test("timeOfDay matches reference semantics (project_eda.py:304-311)") {
    assert(eval(Seq(0, 8, 9, 17, 18, 23), Buckets.timeOfDay) ==
      Seq("sleep_hours", "sleep_hours", "workday", "workday", "afternoon", "afternoon"))
  }

  test("isWeekday: Spark dayofweek 1/7 are weekend (project_eda.py:313-317)") {
    assert(eval(Seq(1, 2, 6, 7), Buckets.isWeekday) ==
      Seq("weekend", "weekday", "weekday", "weekend"))
  }

  test("season replicates the reference's (month+1)//4 bucketing (project_eda.py:319-328)") {
    val got = (1 to 12).map(m => eval(Seq(m), Buckets.season).head)
    assert(got == Seq("winter", "winter", "spring", "spring", "spring", "spring",
      "summer", "summer", "summer", "summer", "fall", "fall"))
  }

  test("timeSlot covers all 24 hours with 3-hour labels (project_eda.py:690-701)") {
    val got = (0 to 23).map(h => eval(Seq(h), Buckets.timeSlot).head)
    assert(got.distinct.size == 8)
    assert(got.head == "00:00-03:00" && got.last == "21:00-00:00")
    assert(!got.contains("0"), "otherwise-branch must be unreachable for real hours")
  }
}
