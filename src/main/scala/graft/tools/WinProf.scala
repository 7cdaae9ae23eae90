package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object WinProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[winprof] $l ${(System.nanoTime() - t0)/1e9}%8.2f s")
    }
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val t = d.select(col("doc_id"),
      TextFunctions.shingleHashArray(TextFunctions.tokens(col("text")), 3, true).as("hs"))
    val w = 4
    val picks = transform(
      sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
      i => {
        val win = slice(col("hs"), i, lit(w))
        val mn = array_min(win)
        struct((i + array_position(win, mn) - 1).cast("long").as("p"), mn.as("sh"))
      })
    val deduped = flatten(transform(array(picks), ps =>
      transform(
        filter(sequence(lit(1), size(ps)),
          i => i === 1 || element_at(ps, i) =!= element_at(ps, i - 1)),
        i => element_at(ps, i))))
    for (r <- 1 to 2) {
      time(s"A picks as column (rep$r)")(t.withColumn("picks", picks).select("doc_id", "picks"))
      time(s"B deduped as column (rep$r)")(t.select(col("doc_id"), deduped.as("dd")))
      time(s"C explode(picks) (rep$r)")(t.select(col("doc_id"), explode(picks).as("f")))
      time(s"D explode(deduped) (rep$r)")(t.select(col("doc_id"), explode(deduped).as("f")))
    }
    spark.stop()
  }
}
