package graft

import org.apache.spark.sql.SparkSession

/** The engine's shuffle-coalescing posture, shared by every harness
  * session (Bench, Verify, the tools/ loops) so a timing measured in one
  * is the timing the others see.
  *
  * Three AQE settings, all scale-adaptive BY MECHANISM (they read actual
  * shuffle byte sizes at runtime, so behavior derives from data volume,
  * not from a constant tuned to this box):
  *
  *  - `coalescePartitions.parallelismFirst=false` — coalesce post-shuffle
  *    partitions toward the advisory byte target instead of refusing to
  *    go below the core count. The default (true) is a small-cluster
  *    courtesy that Spark's own docs recommend disabling on real
  *    workloads; with it, a 20 KB shuffle still runs `cpus` tasks and
  *    per-task launch/fetch overhead dominates every small stage (the
  *    measured q74 profile: 964 tasks, 18 s of task time for 5 s of
  *    wall on 32 cores).
  *  - `advisoryPartitionSizeInBytes=1m` (env-tunable) — the byte target.
  *    1 MB keeps KB-scale shuffles at 1 task while leaving MB-scale
  *    CPU-dense stages (exact quantiles, array set-ops) 8-32-wide, which
  *    the 64 MB default would collapse to a single task at this corpus
  *    size — measured +0.9..+1.6 s each on q29/q37/q59/q77. On a real
  *    cluster with TB-scale shuffles set SPARK_GRAFT_AQE_ADVISORY=64m
  *    (Spark's default, sized to amortize IO chunking, not task launch).
  *  - `canChangeCachedPlanOutputPartitioning=true` — lets AQE apply the
  *    same coalescing to stages that read persisted frames; the
  *    iterative operators (graph loops, LSH pipelines) persist their
  *    loop state, so without this the two knobs above never reach the
  *    very stages that pay the most per-round overhead.
  *
  * Measured on the 18-query winner/loser probe set (warm-min, sf0.1,
  * interleaved A/D runs): 49.2 s -> 41.2 s, with every former loser
  * within ±0.1 s. Results are identical — partition counts change,
  * row sets don't (re-verified tri-scale against the DuckDB oracle).
  */
object EngineConf {
  def coalescing(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "1m"))
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED_REPLAN", "true"))
}
