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
}
