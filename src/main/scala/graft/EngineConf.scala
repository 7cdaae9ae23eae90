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
  *  - `advisoryPartitionSizeInBytes` (env-tunable) — the byte target.
  *    The CODE default is 64m (Spark's own default, sized to amortize IO
  *    chunking at TB-scale shuffles) so a production deployment that
  *    builds a session through [[coalescing]] gets the 100 TB-safe value
  *    with no env set. The LOCAL harnesses (Bench/Verify/tools — the
  *    sf0.1 single-box regime) go through [[localHarness]], which
  *    defaults the same knob to 1m: at KB-scale shuffles 1 MB keeps tiny
  *    stages at 1 task while leaving MB-scale CPU-dense stages (exact
  *    quantiles, array set-ops) 8-32-wide, which 64m would collapse to a
  *    single task at this corpus size — measured +0.9..+1.6 s each on
  *    q29/q37/q59/q77 (round 18). SPARK_GRAFT_AQE_ADVISORY overrides
  *    either default.
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
  /** Production posture: 64m advisory (the 100 TB-safe code default). */
  def coalescing(b: SparkSession.Builder,
                 advisoryDefault: String = "64m"): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", advisoryDefault))
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED_REPLAN", "true"))

  /** The single-box harness posture (Bench/Verify/tools): identical knobs,
    * 1m advisory default — the measured-right target for this fixture's
    * KB-scale shuffles (see the scaladoc above). Every harness session
    * must go through ONE of these two entry points so a timing measured
    * in one tool is the timing the others see. */
  def localHarness(b: SparkSession.Builder): SparkSession.Builder =
    coalescing(b, advisoryDefault = "1m")

  /** Initial `spark.sql.shuffle.partitions` for a harness session,
    * derived from the INPUT DIRECTORY's bytes instead of the core count
    * (r19 — verdict item 1): ceil(dirBytes / 2 MB), clamped to [2, 4096].
    * The core-pinned width (partitions = cpus) made every pre-AQE shuffle
    * `cpus` buckets wide regardless of data volume; at 32 threads on the
    * sf0.1 fixture that cost 15-25% per query over the byte-derived width
    * (min-of-6 A/B: q155 3.50→2.79 s, q91 2.11→1.83, q179 2.42→2.02,
    * q200 2.75→2.56, q124 1.49→1.30) and was why 8 cores beat 32 across
    * the whole r18 suite. AQE still coalesces every post-shuffle stage by
    * actual bytes (EngineConf advisory); this sets only the upper bound
    * and the map-side bucket count. Scale-honest: the width grows with
    * the input (sf0.01 → 2, sf0.1 → 9, 10 GB → 4096 cap) and NEVER reads
    * the core count; a production deployment sizes its own conf
    * (SPARK_GRAFT_SHUFFLE_PARTITIONS overrides, or set
    * spark.sql.shuffle.partitions directly — the engine's operators
    * never touch this knob, only the local harnesses do). */
  def harnessShufflePartitions(inputDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", {
      val dir = new java.io.File(inputDir)
      val bytes =
        if (dir.isDirectory)
          dir.listFiles().filter(_.isFile).map(_.length()).sum
        else 0L
      val target = 2L << 20
      math.max(2L, math.min(4096L, (bytes + target - 1) / target)).toString
    })
}
