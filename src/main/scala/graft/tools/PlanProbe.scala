package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed plan of one registry query (driver-side tooling):
  * `runMain graft.tools.PlanProbe <query_name> [sfDir]`. The round loop's
  * plan-iteration feedback tool — run, read the exchanges, adjust. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.EngineConf.localHarness(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions",
          graft.EngineConf.harnessShufflePartitions(sfDir))
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(s"[probe] generates=${"Generate".r.findAllIn(p).size} " +
      s"reusedExchange=${"ReusedExchange".r.findAllIn(p).size} " +
      s"exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size}")
    println(p)
    spark.stop()
  }
}
