package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private def fit(cmp: Seq[(String, String)], iters: Int): Map[String, Double] =
    BradleyTerry.fit(cmp.toDF("w", "l"), col("w"), col("l"), iters)
      .as[(String, Double)].collect().toMap

  test("two items: MM lands on the closed-form MLE in one step and stays") {
    // A beats B 3x, B beats A 1x -> BT MLE: p_A/(p_A+p_B) = 3/4, and with
    // sum-normalization p = (0.75, 0.25). From p0 = (.5,.5) the first MM
    // update already yields it (den = n/(p_A+p_B) = 4 for both), so more
    // iterations must not move it — the fixed-point sanity check.
    for (it <- 1 to 3) {
      val p = fit(Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")), it)
      assert(math.abs(p("A") - 0.75) < 1e-12 && math.abs(p("B") - 0.25) < 1e-12,
        s"iters=$it: $p")
    }
  }

  test("transitive dominance orders strengths; zero-win item pins to 0") {
    // A beats B and C; B beats C; C never wins
    val p = fit(Seq(("A", "B"), ("A", "C"), ("B", "C")), 3)
    assert(p("A") > p("B") && p("B") > p("C"), p.toString)
    assert(p("C") == 0.0, "an item with zero wins is the MM fixed point 0")
    assert(math.abs(p.values.sum - 1.0) < 1e-12, "sum-normalized")
  }

  test("strengths reflect win RATES against shared opposition, not raw win counts") {
    // A: 9 wins / 1 loss vs C. B: 2 wins / 18 losses vs C. A must
    // outrank B by a wide factor even though both "have wins".
    val cmp = Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A")) ++
      Seq.fill(2)(("B", "C")) ++ Seq.fill(18)(("C", "B"))
    val p = fit(cmp, 3)
    assert(p("A") > 5 * p("B"), p.toString)
  }

  test("iteration: the games cache never re-exchanges (strength joins broadcast)") {
    // The 100 TB shape: games/comparisons are unbounded, items are
    // broadcast-sized by contract — so per iteration NOTHING games-sized
    // may shuffle. Audit one un-checkpointed iteration: the games
    // in-memory scan must feed broadcast joins and a partial aggregate
    // satisfied by its own cached partitioning, never a fresh Exchange.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def expand(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case _ => p.children.flatMap(expand)
    })
    def moved(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: ShuffleExchangeExec => Seq(p)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => Seq(p)
      case a: AdaptiveSparkPlanExec => p +: moved(a.executedPlan)
      case q: QueryStageExec => p +: moved(q.plan)
      case _ => p +: p.children.flatMap(moved)
    }
    def isGamesScan(p: SparkPlan): Boolean = p match {
      case s: InMemoryTableScanExec =>
        s.output.map(_.name).sorted == Seq("i", "j", "n")
      case _ => false
    }
    val cmp = (0 until 300).map(i => (s"s${i % 7}", s"s${(i * 3 + 1) % 7}"))
      .filter(p => p._1 != p._2).toDF("w", "l")
    scala.util.Using.resource(new CacheScope()) { scope =>
      val c = cmp.select(col("w"), col("l"))
      val games = scope.persist(
        c.select(col("w").as("i"), col("l").as("j"))
          .union(c.select(col("l").as("i"), col("w").as("j")))
          .groupBy("i", "j").agg(count(lit(1)).cast("double").as("n"))
          .repartition(col("i")))
      val wins = scope.persist(games.select(col("i").as("item")).distinct()
        .join(c.groupBy(col("w").as("item"))
          .agg(count(lit(1)).cast("double").as("wins")), Seq("item"), "left")
        .select(col("item"), coalesce(col("wins"), lit(0.0)).as("wins")))
      val p0 = wins.select(col("item"), lit(1.0 / 7).as("p")).localCheckpoint()
      val it = BradleyTerry.iteration(games, wins, p0)
      it.collect()
      val nodes = expand(it.queryExecution.executedPlan)
      assert(nodes.exists(isGamesScan), "games cache must feed the iteration")
      val bad = nodes.collect {
        case s: ShuffleExchangeExec if moved(s.child).exists(isGamesScan) => s
      }
      assert(bad.isEmpty,
        s"iteration re-exchanges the games cache:\n${bad.mkString("\n")}")
    }
  }

  test("q166 emitted micro-digits are partitioning-invariant (4 vs 32 shuffle partitions)") {
    // the q124 lesson applied to this family's own oracle row: the
    // nudged quantizer must make the EMITTED digits a pure function of
    // the data under any partitioning
    val q = graft.SparkEntry.registry.find(_.name == "q166_bradley_terry").get
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(p: String): Map[String, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      q.run(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    try {
      val at4 = run("4")
      val at32 = run("32")
      val diff = at4.keySet.filter(k => !at32.get(k).contains(at4(k)))
      assert(at4.keySet == at32.keySet && diff.isEmpty,
        s"q166 micro-digits differ across partitioning at ${diff.take(5)}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("deterministic across partitioning (the q124-family pin)") {
    val cmp = (0 until 300).map { i =>
      val a = s"s${i % 7}"; val b = s"s${(i * 3 + 1) % 7}"
      if (i % 5 < 3) (a, b) else (b, a)
    }.filter(p => p._1 != p._2)
    val one = fit(cmp, 3)
    val other = BradleyTerry.fit(cmp.toDF("w", "l").repartition(13),
        col("w"), col("l"), 3)
      .as[(String, Double)].collect().toMap
    assert(one.keySet == other.keySet)
    one.foreach { case (k, v) =>
      assert(math.abs(v - other(k)) < 1e-12, s"item $k")
    }
  }
}
