package graft.tools
import org.apache.spark.sql.SparkSession
/** Time registry queries (driver-side tooling):
  *   runMain graft.tools.QTime <name>[,<name>...] [sfDir] [reps]
  * Comma-separate names to time a subset in ONE JVM (the fast loop for
  * conf A/Bs — JVM spinup would otherwise dominate). Reps interleave
  * across the set (pass semantics like Bench) and rep1 is cold: read
  * rep2+. Extra spark confs come in via SPARK_GRAFT_EXTRA_JAVA_OPTS
  * -D passthrough (build.sbt).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.localHarness(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions",
          graft.EngineConf.harnessShufflePartitions(dir))
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    for (r <- 1 to reps; (name, q) <- qs) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      if (r > 1) best(name) = math.min(best(name), secs)
      println(f"[qtime] $name rep$r $secs%8.2f s")
    }
    if (reps > 1) for ((n, _) <- qs)
      println(f"[qtime-min] $n ${best(n)}%8.2f s (min of warm reps)")
    spark.stop()
  }
}
