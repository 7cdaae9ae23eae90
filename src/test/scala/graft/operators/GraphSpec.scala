package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val d = 0.85

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, Double] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("s", "t")
    Graph.pageRank(n, col("id"), e, col("s"), col("t"), iters)
      .as[(Long, Double)].collect().toMap
  }

  test("two-node cycle is the stationary distribution from iteration 1") {
    val r = ranks(Seq(1L, 2L), Seq(1L -> 2L, 2L -> 1L), 3)
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }

  test("rank mass sums to 1 every iteration, dangling nodes included") {
    // 3 points at the dangling hub 4; hub's rank re-spreads uniformly
    val edges = Seq(1L -> 4L, 2L -> 4L, 3L -> 4L)
    for (k <- 1 to 4) {
      val r = ranks(Seq(1L, 2L, 3L, 4L), edges, k)
      assert(math.abs(r.values.sum - 1.0) < 1e-9, s"iter $k: ${r.values.sum}")
    }
    val r = ranks(Seq(1L, 2L, 3L, 4L), edges, 2)
    assert(r(4L) > r(1L), "pointed-at hub must outrank its sources")
    assert(math.abs(r(1L) - r(2L)) < 1e-15, "symmetric sources rank equally")
  }

  test("dangling hub: hand-computed one-iteration values match") {
    // nodes {1,2,3}, edges 1->3, 2->3; 3 dangles.
    // iter 1: contrib(3) = 1/3 + 1/3; dangling mass = 1/3
    //   r(1) = r(2) = .05 + .85*(1/9); r(3) = .05 + .85*(2/3 + 1/9)
    val r = ranks(Seq(1L, 2L, 3L), Seq(1L -> 3L, 2L -> 3L), 1)
    assert(math.abs(r(1L) - (0.05 + d * (1.0 / 9))) < 1e-12)
    assert(math.abs(r(3L) - (0.05 + d * (2.0 / 3 + 1.0 / 9))) < 1e-12)
  }

  test("isolated node keeps teleport + dangling share only") {
    val r = ranks(Seq(1L, 2L, 3L), Seq(1L -> 2L, 2L -> 1L), 3)
    // node 3 never receives link mass and its own mass dangles
    assert(r(3L) < r(1L) && r(3L) > 0)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  private def pprRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                       seeds: Seq[(Long, Double)], iters: Int): Map[Long, Double] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("s", "t")
    val p = seeds.toDF("id", "w")
    Graph.personalizedPageRank(n, col("id"), e, col("s"), col("t"),
        p, col("id"), col("w"), iters)
      .as[(Long, Double)].collect().toMap
  }

  test("personalized: rank mass sums to 1 with seeded teleport and dangling nodes") {
    val edges = Seq(1L -> 4L, 2L -> 4L, 3L -> 4L)
    for (k <- 1 to 3) {
      val r = pprRanks(Seq(1L, 2L, 3L, 4L), edges, Seq(1L -> 1.0, 2L -> 3.0), k)
      assert(math.abs(r.values.sum - 1.0) < 1e-9, s"iter $k: ${r.values.sum}")
      assert(r(2L) > r(1L), "heavier seed must outrank the lighter one")
    }
  }

  test("personalized: uniform preferences reproduce plain PageRank") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 3L)
    val plain = ranks(nodes, edges, 3)
    val ppr = pprRanks(nodes, edges, nodes.map(_ -> 1.0), 3)
    // same update rule up to fp association ((1−d)/N vs (1−d)·(1/N))
    nodes.foreach(k => assert(math.abs(plain(k) - ppr(k)) < 1e-12, s"node $k"))
  }

  test("personalized: a page unreachable from the seeds ranks exactly 0") {
    // 3 -> 1 links OUT of the spam node; nothing links in, and it is not
    // a seed — plain PageRank still gives it teleport mass, PPR gives 0
    val r = pprRanks(Seq(1L, 2L, 3L), Seq(1L -> 2L, 2L -> 1L, 3L -> 1L),
      Seq(1L -> 1.0), 3)
    assert(r(3L) == 0.0)
    assert(ranks(Seq(1L, 2L, 3L), Seq(1L -> 2L, 2L -> 1L, 3L -> 1L), 3)(3L) > 0)
  }

  test("personalized: hand-computed one-iteration values on a weighted 2-cycle") {
    // p = (2/3, 1/3); iter 1: contrib(2) = r0(1) = 2/3, contrib(1) = 1/3
    val r = pprRanks(Seq(1L, 2L), Seq(1L -> 2L, 2L -> 1L), Seq(1L -> 2.0, 2L -> 1.0), 1)
    assert(math.abs(r(1L) - ((1 - d) * (2.0 / 3) + d * (1.0 / 3))) < 1e-12)
    assert(math.abs(r(2L) - ((1 - d) * (1.0 / 3) + d * (2.0 / 3))) < 1e-12)
  }

  test("personalized: degenerate preference vectors fail loudly") {
    intercept[IllegalArgumentException] {
      pprRanks(Seq(1L, 2L), Seq(1L -> 2L), Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      pprRanks(Seq(1L, 2L), Seq(1L -> 2L), Seq(1L -> -1.0), 1)
    }
  }

  private def hitsScores(nodes: Seq[Long], edges: Seq[(Long, Long)],
                         iters: Int): Map[Long, (Double, Double)] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("s", "t")
    Graph.hits(n, col("id"), e, col("s"), col("t"), iters)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
  }

  test("hits: hand-computed one-iteration values on a co-citation pair") {
    // 1 -> 3, 2 -> 3: both sources are perfect hubs, 3 the sole authority
    val r = hitsScores(Seq(1L, 2L, 3L), Seq(1L -> 3L, 2L -> 3L), 1)
    assert(r(3L) == (0.0, 1.0), s"node 3 must be pure authority: $r")
    assert(r(1L) == (1.0, 0.0) && r(2L) == (1.0, 0.0),
      s"symmetric sources must be max-normalized hubs: $r")
  }

  test("hits: hub and authority separate on a directory-page topology") {
    // 1 is a directory (links to 2,3,4 which have content in-links from
    // elsewhere); 5,6 also point at 2 — node 2 is the top authority,
    // node 1 the top hub, and 1 earns ~no authority (only 4->1 back-link)
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 5L -> 2L, 6L -> 2L, 4L -> 1L)
    val r = hitsScores(Seq(1L, 2L, 3L, 4L, 5L, 6L), edges, 3)
    assert(r(1L)._1 == 1.0, "directory page must be the max-normalized top hub")
    assert(r(2L)._2 == 1.0, "most-cited page must be the top authority")
    assert(r(2L)._1 == 0.0, "sink content page has no out-links, hence hub 0")
    assert(r(1L)._2 < 0.5, s"directory page should be a weak authority: ${r(1L)}")
  }

  test("hits: scores are in [0,1] and deterministic across partitioning") {
    val nodes = (0L until 200L)
    val edges = nodes.flatMap(i => Seq(i -> (i * 7 + 3) % 200, i -> (i * 13 + 5) % 200))
    val a = hitsScores(nodes, edges, 2)
    assert(a.values.forall { case (h, au) => h >= 0 && h <= 1 && au >= 0 && au <= 1 })
    assert(a.values.exists(_._1 == 1.0) && a.values.exists(_._2 == 1.0),
      "max normalization must pin the top of each score to exactly 1")
    val n2 = nodes.toDF("id").repartition(7)
    val e2 = edges.toDF("s", "t").repartition(5)
    val b = Graph.hits(n2, col("id"), e2, col("s"), col("t"), 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, au) => id -> (h, au) }.toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, (h, au)) =>
      assert(math.abs(h - b(k)._1) < 1e-12 && math.abs(au - b(k)._2) < 1e-12, s"node $k")
    }
  }

  test("hits: neither half-update re-exchanges its edge copy (two-copy layout)") {
    // The 100 TB guarantee behind the two-copy layout: inside the loop
    // only (id, double) score frames may shuffle — the edge table, the
    // dominant frame at crawl scale, is bought out once into a src- and
    // a dst-partitioned cached copy. Audit one un-checkpointed
    // half-update each way with broadcast joins disabled (so every join
    // must prove its distribution): the edge side must satisfy the join
    // from its cached partitioning, never from a fresh Exchange.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

    // full-tree expansion across AQE wrappers and materialized stages
    def expand(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case _ => p.children.flatMap(expand)
    })
    // what an exchange actually MOVES: its child subtree, stopping at
    // further exchanges (separate stages) and at aggregates (a map-side
    // combine below the exchange means (key, agg) rows move, bounded by
    // distinct keys — not the raw rows beneath it)
    def moved(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: ShuffleExchangeExec => Seq(p)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => Seq(p)
      case a: AdaptiveSparkPlanExec => p +: moved(a.executedPlan)
      case q: QueryStageExec => p +: moved(q.plan)
      case _ => p +: p.children.flatMap(moved)
    }
    // the edge caches are the only 2-column (src, dst) in-memory scans;
    // the cache-fill repartition lives INSIDE the relation's cachedPlan,
    // which this traversal deliberately does not enter
    def isEdgeScan(p: SparkPlan): Boolean = p match {
      case s: InMemoryTableScanExec => s.output.map(_.name).sorted == Seq("dst", "src")
      case _ => false
    }
    def assertEdgeStaysPut(df: DataFrame, what: String): Unit = {
      df.collect()
      val nodes = expand(df.queryExecution.executedPlan)
      assert(nodes.exists(isEdgeScan),
        s"$what: edge cache must feed the join directly")
      val bad = nodes.collect {
        case s: ShuffleExchangeExec if moved(s.child).exists(isEdgeScan) => s
      }
      assert(bad.isEmpty,
        s"$what re-exchanges the edge cache inside the loop:\n${bad.mkString("\n")}")
    }

    val nodes = (0L until 200L)
    val edges = nodes.flatMap(i => Seq(i -> (i * 7 + 3) % 200, i -> (i * 13 + 5) % 200))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // broadcast joins off, so every join must PROVE its distribution —
    // at test size AQE would otherwise just broadcast the edge table and
    // the audit would assert nothing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try scala.util.Using.resource(new CacheScope()) { scope =>
      val (nodeDf, eSrc, eByDst) = Graph.hitsEdges(nodes.toDF("id"), col("id"),
        edges.toDF("s", "t"), col("s"), col("t"), scope)
      val scores0 = nodeDf
        .select(col("node"), lit(1.0).as("hub"), lit(1.0).as("auth"))
        .localCheckpoint()
      val auth = Graph.hitsAuthUpdate(nodeDf, eSrc, scores0)
      assertEdgeStaysPut(auth, "auth half-update")
      assertEdgeStaysPut(
        Graph.hitsHubUpdate(nodeDf, eByDst, auth.localCheckpoint()),
        "hub half-update")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("labelPropagation: chain spreads labels one hop per round, min-label ties, seeds clamped") {
    // undirected chain 1-2-3-4-5 with seeds 1→10, 5→20; node 6 isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
      .withColumn("seed",
        when(col("id") === 1, 10L).when(col("id") === 5, 20L)
          .otherwise(lit(null).cast("long")))
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L).toDF("s", "t")
    def run(iters: Int): Map[Long, Option[Long]] =
      Graph.labelPropagation(nodes, col("id"), col("seed"),
          edges, col("s"), col("t"), iters)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val r1 = run(1)
    assert(r1(2L) == Some(10L) && r1(4L) == Some(20L),
      s"round 1 labels the seeds' neighbors: $r1")
    assert(r1(3L).isEmpty, "mid-chain node has no labeled neighbor in round 1")
    assert(r1(6L).isEmpty, "isolated unseeded node stays unlabeled")
    val r2 = run(2)
    assert(r2(3L) == Some(10L),
      s"equal-count tie must break to the SMALLEST label: $r2")
    assert(r2(1L) == Some(10L) && r2(5L) == Some(20L), "seeds stay clamped")
    // synchronous updates need not converge: in round 3 node 4 ties
    // between 3's label 10 and seed 5's 20, and min-label wins — the
    // smaller community advances one more hop (standard sync-LP
    // behavior; the iteration count is the caller's radius/stop knob)
    val r3 = run(3)
    assert(r3(4L) == Some(10L) && r3(5L) == Some(20L), s"round 3: $r3")
  }

  test("deterministic across partitioning") {
    val nodes = (0L until 200L)
    val edges = nodes.flatMap(i => Seq(i -> (i * 7 + 3) % 200, i -> (i * 13 + 5) % 200))
    val a = ranks(nodes, edges, 3)
    val n2 = nodes.toDF("id").repartition(7)
    val e2 = edges.toDF("s", "t").repartition(5)
    val b = Graph.pageRank(n2, col("id"), e2, col("s"), col("t"), 3)
      .as[(Long, Double)].collect().toMap
    // same update rule, same per-key grouped sums — only summation order
    // may differ, so compare to an ulp-scale tolerance
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"node $k") }
  }

  test("q124/q131 emitted micro-digits are partitioning-invariant (4 vs 32 shuffle partitions)") {
    // The round-9 regression class: repartition(node) changed the float
    // summation order of the contribution sum, and one rank crossed the
    // floor(rank·1e6) boundary at 32 shuffle partitions but not at 4.
    // The nudged quantizer (floor(x·1e6 + 1e-3), q133's rule, applied to
    // both engines) must make the EMITTED digits a pure function of the
    // data — this pin runs the exact query bindings at both partition
    // counts and requires identical output. (Label-prop/HITS already
    // carry this pin; the damped-float pair lacked it.)
    for (name <- Seq("q124_pagerank", "q131_personalized_pagerank")) {
      val q = graft.SparkEntry.registry.find(_.name == name).get
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      def run(p: String): Map[Long, Long] = {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        q.run(spark, sfDir).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      try {
        val at4 = run("4")
        val at32 = run("32")
        val diff = at4.keySet.filter(k => !at32.get(k).contains(at4(k)))
        assert(at4.keySet == at32.keySet && diff.isEmpty,
          s"$name micro-digits differ across partitioning at docs ${diff.take(5)}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("triangleCounts: hand-computed, direction/multiplicity/self-loop proof") {
    // triangle {1,2,3}; tail 3-4; K4 on {10,11,12,13} (4 triangles, each
    // node in 3); duplicate, reversed, and self-loop edges must not count
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L), (3L, 4L), (4L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L)
    ).toDF("s", "t")
    val got = Graph.triangleCounts(edges, col("s"), col("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.333333)))
    assert(got(4L) == ((1L, 0L, 0.0)))
    Seq(10L, 11L, 12L, 13L).foreach { n =>
      assert(got(n) == ((3L, 3L, 1.0)), s"K4 node $n")
    }
    // global count: Σ n_tri / 3 = 1 + 4
    assert(got.values.map(_._2).sum / 3 == 5L)
  }

  test("triangleCounts: orientation finds each triangle exactly once (random graph)") {
    // deterministic pseudo-random graph; reference counts by brute force
    val rnd = new scala.util.Random(20260814L)
    val n = 40
    val es = (for (_ <- 1 to 160)
      yield (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    def adj(a: Long, b: Long) = und.contains((math.min(a, b), math.max(a, b)))
    val ref = (for {
      a <- 0L until n; b <- a + 1 until n; c <- b + 1 until n
      if adj(a, b) && adj(b, c) && adj(a, c)
    } yield (a, b, c)).size
    val got = Graph.triangleCounts(es.toDF("s", "t"), col("s"), col("t"))
      .agg(org.apache.spark.sql.functions.sum("n_tri")).head.getLong(0)
    assert(got == 3L * ref, s"expected $ref triangles, got sum $got")
  }
}
