package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-bucketing column functions.
  *
  * The reference implements these as row-wise Python UDFs
  * (reference: code/eda/project_eda.py:304-328, 690-701), which block both
  * whole-stage codegen and predicate pushdown (SURVEY.md §3 E1). Here each
  * is a pure `when`-chain `Column`, so the whole plan stays inside
  * Tungsten codegen and Catalyst can still push filters below them.
  */
object Buckets {

  /** hour → {sleep_hours, workday, afternoon}.
    * Reference semantics (code/eda/project_eda.py:304-311): <9 sleep,
    * 9..17 workday, else afternoon. */
  def timeOfDay(hour: Column): Column =
    when(hour < 9, "sleep_hours")
      .when(hour <= 17, "workday")
      .otherwise("afternoon")

  /** Spark dayofweek (1=Sunday .. 7=Saturday) → weekend/weekday.
    * Reference semantics: code/eda/project_eda.py:313-317. */
  def isWeekday(dayOfWeek: Column): Column =
    when(dayOfWeek === 1 || dayOfWeek === 7, "weekend").otherwise("weekday")

  /** month → season via the reference's own `(month+1) // 4` bucketing,
    * replicated exactly including the unusual integer division
    * (code/eda/project_eda.py:319-328): 1,2→winter, 3..6→spring,
    * 7..10→summer, 11,12→fall. */
  def season(month: Column): Column = {
    val q = floor((month + lit(1)) / lit(4))
    when(q === 0, "winter")
      .when(q === 1, "spring")
      .when(q === 2, "summer")
      .otherwise("fall")
  }

  /** hour → 3-hour slot label. Reference: code/eda/project_eda.py:690-701.
    * The reference's `.otherwise(0)` default is unreachable (hours cover
    * 0..23); we keep it as the string "0" so the column stays StringType. */
  def timeSlot(hour: Column): Column =
    when(hour.isin(0, 1, 2), "00:00-03:00")
      .when(hour.isin(3, 4, 5), "03:00-06:00")
      .when(hour.isin(6, 7, 8), "06:00-09:00")
      .when(hour.isin(9, 10, 11), "09:00-12:00")
      .when(hour.isin(12, 13, 14), "12:00-15:00")
      .when(hour.isin(15, 16, 17), "15:00-18:00")
      .when(hour.isin(18, 19, 20), "18:00-21:00")
      .when(hour.isin(21, 22, 23), "21:00-00:00")
      .otherwise("0")

  /** Weekend flag from a day-name column ("Monday".."Sunday") — day-name
    * based so semantics are engine-portable (Spark `dayofweek` numbering
    * differs from other engines'). */
  def weekendFromDayName(dayName: Column): Column =
    when(dayName.isin("Saturday", "Sunday"), "weekend").otherwise("weekday")
}
