package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("spread16: hand-computed bit spreads") {
    val got = Seq(0, 1, 2, 3, 0xFFFF, 0xAAAA).toDF("v")
      .select(Layout.spread16(col("v")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    // interleave-with-zero of each value
    assert(got === Seq(0L, 1L, 4L, 5L, 0x55555555L, 0x44444444L))
  }

  test("zValue: interleaves x at even bits, y at odd bits") {
    def ref(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pairs = for (x <- Seq(0, 1, 7, 255, 40000); y <- Seq(0, 3, 128, 65535))
      yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y), s"z($x,$y)")
    }
  }

  test("zValue preserves locality: adjacent cells share z-prefixes") {
    // the defining property used for pruning: a 2^k x 2^k aligned tile
    // occupies one contiguous z range
    def z(x: Int, y: Int): Long =
      Seq((x, y)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"))).head().getLong(0)
    // tile [4..7] x [4..7]: all 16 z-values inside [z(4,4), z(7,7)]
    val tile = for (x <- 4 to 7; y <- 4 to 7) yield (x, y)
    val zs = tile.map { case (x, y) => z(x, y) }
    assert(zs.min === z(4, 4) && zs.max === z(7, 7))
    assert(zs.toSet.size === 16)
    // and nothing outside the tile lands inside that range
    val outside = Seq((3, 4), (8, 4), (4, 3), (0, 12), (12, 0))
    outside.foreach { case (x, y) =>
      val v = z(x, y)
      assert(v < zs.min || v > zs.max, s"($x,$y) intrudes into the tile range")
    }
  }

  test("zorder layout beats single-column sort for cross-column skipping") {
    // 64x64 grid, one row per cell; lay out into 16 partitions both ways
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).cast("int").as("x"),
        (col("id") / 64).cast("int").as("y"))
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Int, Int)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        .toSeq

    val zBoxes = boxes(Layout.zorder(grid, col("x"), col("y"), partitions = 16))
    val linBoxes = boxes(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))

    // pruning power for a predicate on y: fraction of partitions whose
    // [y0, y1] excludes y = 5
    def pruned(bs: Seq[(Int, Int, Int, Int)]): Int =
      bs.count { case (_, _, y0, y1) => 5 < y0 || 5 > y1 }
    assert(pruned(linBoxes) === 0,
      "x-sorted layout cannot prune a y predicate at all")
    assert(pruned(zBoxes) >= zBoxes.size / 2,
      s"z-order should prune most partitions for a y predicate: $zBoxes")

    // and x-pruning is retained (not as sharp as a pure x sort, but real)
    def prunedX(bs: Seq[(Int, Int, Int, Int)]): Int =
      bs.count { case (x0, x1, _, _) => 5 < x0 || 5 > x1 }
    assert(prunedX(zBoxes) >= zBoxes.size / 2)
  }

  test("zorder emits exactly one exchange (the range partition)") {
    val grid = spark.range(1024)
      .select((col("id") % 32).cast("int").as("x"),
        (col("id") / 32).cast("int").as("y"))
    val plan = Layout.zorder(grid, col("x"), col("y"), partitions = 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("spread16Sql stays the literal twin of spread16") {
    // evaluate the SQL twin through Spark itself (same int64 shift/mask
    // semantics as DuckDB) and compare against the Column form
    val df = Seq(0, 1, 3, 0x1234, 0xFFFF, 54321).toDF("v")
    val viaSql = df.selectExpr(s"${Layout.spread16Sql("v")} AS s")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(Layout.spread16(col("v"))).collect()
      .map(_.getLong(0)).toSeq
    assert(viaSql === viaCol)
  }
}
