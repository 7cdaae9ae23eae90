package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Scale probe for the link-graph operator family (driver-side tooling):
  * a 1M-node, 3M-edge hash-generated web graph — the q124/q131/q133/q134
  * generator shape at 2000× the sf0.01 corpus — through PageRank,
  * personalized PageRank, HITS, and label propagation at the oracle
  * queries' iteration counts. Records wall time per operator plus the
  * result-side sanity numbers (mass, top score, label coverage) that
  * prove the runs did real work. Committed numbers in EXPLAIN.md.
  *
  * Graph scale knob: SPARK_GRAFT_GRAPH_NODES (default 1,000,000). */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_GRAPH_NODES", "1000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nodes = spark.range(n).select(col("id").as("node")).cache()
    nodes.count()
    // 3 hash outlinks per node, self-loops dropped — the q124 generator
    val edges = nodes
      .select(col("node").as("src"),
        explode(sequence(lit(1), lit(3))).as("j"))
      .withColumn("dst", pmod(xxhash64(concat(col("src").cast("string"),
        lit(":"), col("j"))), lit(n)))
      .filter(col("dst") =!= col("src"))
      .select("src", "dst").cache()
    val ne = edges.count()
    println(f"[graph] $n%,d nodes, $ne%,d edges")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graph] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }

    timed("pagerank(3)") {
      val pr = Graph.pageRank(nodes, col("node"), edges, col("src"), col("dst"), 3)
      val m = pr.agg(sum("rank")).head.getDouble(0)
      println(f"[graph]   rank mass = $m%.6f (must be ~1)")
    }
    timed("personalized_pr(3)") {
      val seeds = nodes.filter(col("node") % 10 === 0)
        .select(col("node"), lit(1.0).as("w"))
      val pr = Graph.personalizedPageRank(nodes, col("node"),
        edges, col("src"), col("dst"), seeds, col("node"), col("w"), 3)
      val m = pr.agg(sum("rank")).head.getDouble(0)
      println(f"[graph]   rank mass = $m%.6f (must be ~1)")
    }
    timed("hits(2)") {
      val h = Graph.hits(nodes, col("node"), edges, col("src"), col("dst"), 2)
      val tops = h.agg(max("hub"), max("auth")).head
      println(s"[graph]   max hub = ${tops.getDouble(0)}, max auth = ${tops.getDouble(1)} (must be 1.0)")
    }
    timed("triangles") {
      val t = Graph.triangleCounts(edges, col("src"), col("dst"))
      val agg = t.agg(sum("n_tri"), max("deg"), avg("lcc")).head
      println(f"[graph]   Σtri/3 = ${agg.getLong(0) / 3}%,d triangles, " +
        f"max deg = ${agg.getLong(1)}, mean lcc = ${agg.getDouble(2)}%.6f")
    }
    timed("label_prop(3)") {
      val seeded = nodes.withColumn("seed",
        when(col("node") % 1000 === 0, col("node") % 5)
          .otherwise(lit(null).cast("long")))
      val lp = Graph.labelPropagation(seeded, col("node"), col("seed"),
        edges, col("src"), col("dst"), 3)
      val covered = lp.filter(col("label").isNotNull).count()
      println(f"[graph]   labeled $covered%,d / $n%,d nodes from ${n / 1000}%,d seeds")
    }
    spark.stop()
  }
}
