package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Link-graph analytics for web-corpus curation. A crawl-scale corpus
  * carries a link graph (page → outlinks), and production pipelines use
  * link centrality as a document-quality prior (Common Crawl publishes
  * harmonic/PageRank centrality per host; quality-gated corpora weight
  * by it). Reference tie-in: the reference scores documents only by
  * content signals — centrality is the graph-side signal its corpus
  * lacks, computed here with the same iterative-join discipline as
  * [[graft.dedup.Dedup.connectedComponents]].
  */
object Graph {

  /** PageRank over an explicit node set by power iteration:
    *
    *   rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N)
    *
    * where `dangling` is the total rank parked on nodes with no
    * out-edges (redistributed uniformly — the standard stochastic-matrix
    * patch, so Σ rank stays 1 every iteration). Fixed iteration count:
    * a convergence test would add a driver round-trip per iteration for
    * a number production jobs pin anyway (power iteration's error decays
    * as d^k regardless of graph size, so k is a precision knob, not a
    * data-dependent one).
    *
    * The node set is explicit (not inferred from edges) because corpus
    * membership is the caller's contract: isolated documents must still
    * receive the teleport mass. Edges referencing ids outside `nodes`
    * contribute mass that vanishes (standard subgraph projection).
    *
    * Scale shape per iteration: the edge table — joined once with
    * out-degrees, persisted, and pre-partitioned on `src` — never moves
    * again; only the rank frame (8-byte id + double) shuffles into the
    * contribution join, followed by one `groupBy(dst)` partial-agg
    * shuffle. The dangling mass is a 1-row aggregate crossed back in by
    * broadcast — never a driver collect. `localCheckpoint` truncates
    * lineage each iteration (same discipline as connectedComponents /
    * hierarchyDepth); the driver sees one scalar count up front (N) and
    * nothing else.
    */
  def pageRank(nodes: DataFrame, nodeCol: Column,
               edges: DataFrame, srcCol: Column, dstCol: Column,
               iterations: Int, damping: Double = 0.85,
               scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val nodeDf = scope.persist(nodes.select(nodeCol.as("node")))
    val n = nodeDf.count().toDouble
    require(n > 0, "pageRank over an empty node set")
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
    val deg = scope.persist(
      e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")))
    val outE = scope.persist(e.join(deg, "src").repartition(col("src")))

    // NOT expressed via the personalized loop with uniform p: the update
    // here folds the teleport into the compile-time constant (1−d)/N and
    // divides dangling mass by N, and the q124 oracle replays exactly
    // that associativity — (1−d)·(1/N) and dmass·(1/N) can differ from
    // (1−d)/N and dmass/N by an ulp, which the floor-quantized output
    // would surface as a flipped micro-digit.
    var ranks = nodeDf.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = outE
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      val dangling = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      ranks = nodeDf
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dmass") / n))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Personalized (topic-sensitive) PageRank: teleportation lands on a
    * caller-supplied preference distribution instead of uniformly —
    *
    *   rank'(v) = (1−d)·p(v) + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling·p(v))
    *
    * with p the normalized preference vector (weights are normalized here;
    * nodes absent from `prefs` get p = 0) and dangling mass re-teleported
    * BY p — the Haveliwala topic-sensitive formulation, which keeps the
    * chain stochastic over the personalized geometry so Σ rank stays 1.
    * The corpus use is a seeded quality prior: teleport to a vetted seed
    * set (curated domains, high-quality docs) and rank measures proximity
    * to the seeds through the link graph — unreachable spam pools that
    * plain PageRank still pays teleport mass to collapse to rank 0.
    *
    * Same per-iteration scale shape as [[pageRank]]; the only extra cost
    * is p riding along in the rank frame (one more double per node).
    */
  def personalizedPageRank(nodes: DataFrame, nodeCol: Column,
                           edges: DataFrame, srcCol: Column, dstCol: Column,
                           prefs: DataFrame, prefNodeCol: Column, prefWeightCol: Column,
                           iterations: Int, damping: Double = 0.85,
                           scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val nodeDf = scope.persist(nodes.select(nodeCol.as("node")))
    require(nodeDf.count() > 0, "personalizedPageRank over an empty node set")
    val w = scope.persist(
      prefs.select(prefNodeCol.as("node"), prefWeightCol.cast("double").as("w")))
    // Normalization total: a 1-row driver read (documented driver-tiny
    // contract) so a degenerate preference vector fails LOUDLY here, not
    // as silent NaN ranks downstream. Negative weights and an all-zero /
    // empty seed set are caller bugs, not distributions.
    val Array(minW, totalW) = w.agg(
      coalesce(min("w"), lit(0.0)), coalesce(sum("w"), lit(0.0)))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    require(minW >= 0, s"personalizedPageRank: negative preference weight $minW")
    require(totalW > 0, "personalizedPageRank: preference weights sum to 0 (empty seed set?)")
    val p = scope.persist(nodeDf
      .join(w, Seq("node"), "left")
      .select(col("node"), (coalesce(col("w"), lit(0.0)) / totalW).as("p")))
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
    val deg = scope.persist(
      e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")))
    val outE = scope.persist(e.join(deg, "src").repartition(col("src")))

    var ranks = p.select(col("node"), col("p").as("rank"), col("p"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = outE
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy("dst")
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      val dangling = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      ranks = p
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(1 - damping) * col("p") + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dmass") * col("p")))
            .as("rank"),
          col("p"))
        .localCheckpoint()
    }
    ranks.select("node", "rank")
  }
}
