package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long, Long)], capacity: Long) =
    Packing.packGreedy(rows.toDF("shard", "doc_id", "w"),
        col("doc_id"), col("w"), col("shard"), capacity)
      .orderBy("shard", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSeq // (doc_id, shard, bin, fill) — col 3 is w, echoed input

  test("greedy fill in id order with reset on overflow") {
    // capacity 10: [4,4,4] -> bins 0,0,1; exact fit [6,4] shares a bin
    val out = pack(Seq((1L, 1L, 4L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 10L, 6L), (2L, 11L, 4L)), capacity = 10)
    assert(out == Seq((1L, 1L, 0L, 4L), (2L, 1L, 0L, 8L), (3L, 1L, 1L, 4L),
      (10L, 2L, 0L, 6L), (11L, 2L, 0L, 10L)))
  }

  test("an overweight doc gets a bin of its own and closes it") {
    val out = pack(Seq((1L, 1L, 3L), (1L, 2L, 99L), (1L, 3L, 3L)), capacity = 10)
    assert(out.map(t => t._3) == Seq(0L, 1L, 2L))
  }

  test("bins number from zero independently per shard") {
    val out = pack(Seq((7L, 1L, 9L), (7L, 2L, 9L), (8L, 3L, 9L)), capacity = 10)
    assert(out.filter(_._2 == 7L).map(_._3) == Seq(0L, 1L))
    assert(out.filter(_._2 == 8L).map(_._3) == Seq(0L))
  }

  test("first doc opens bin 0 even when already over capacity") {
    val out = pack(Seq((1L, 1L, 99L), (1L, 2L, 5L)), capacity = 10)
    assert(out == Seq((1L, 1L, 0L, 99L), (2L, 1L, 1L, 5L)))
  }

  test("packedBoundaries: spans tile each bin exactly, in doc order") {
    val rows = Seq((1L, 1L, 4L), (1L, 2L, 4L), (1L, 3L, 4L),
      (1L, 4L, 10L), (2L, 10L, 6L), (2L, 11L, 4L))
    val packed = Packing.packGreedy(rows.toDF("shard", "doc_id", "w"),
      col("doc_id"), col("w"), col("shard"), capacity = 10)
    val b = Packing.packedBoundaries(packed).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    // within every (shard, bin): spans start at 0, are contiguous
    // (each start = previous start + previous len), and never overlap
    b.groupBy(_._1).foreach { case ((shard, bin), ds) =>
      val spans = ds.map(_._2).sortBy(_._1) // by doc_id (packing order)
      var expect = 0L
      spans.foreach { case (doc, start, len) =>
        assert(start === expect, s"shard=$shard bin=$bin doc=$doc")
        expect = start + len
      }
    }
    // and the mask derivation adds no shuffle beyond packGreedy's own
    val plan = Packing.packedBoundaries(packed).queryExecution
      .executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size ===
      "Exchange".r.findAllIn(packed.queryExecution.executedPlan.toString).size)
  }

  test("packing invariants hold on randomized seeded input") {
    val rnd = new scala.util.Random(20260812L)
    val cap = 100L
    val rows = Seq.tabulate(400) { i =>
      (rnd.nextInt(5).toLong, i.toLong, (1 + rnd.nextInt(120)).toLong) // some docs > cap
    }
    val out = Packing.packGreedy(rows.toDF("shard", "doc_id", "w"),
        col("doc_id"), col("w"), col("shard"), cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc packed exactly once
    assert(out.length == rows.length)
    val byShardBin = out.groupBy(t => (t._2, t._3))
    byShardBin.foreach { case ((shard, bin), docs) =>
      val total = docs.map(_._4).sum
      // a bin only exceeds capacity when it holds a single overweight doc
      assert(total <= cap || (docs.length == 1 && docs.head._4 > cap),
        s"shard=$shard bin=$bin total=$total docs=${docs.length}")
    }
    // bins are dense from 0 within each shard
    out.groupBy(_._2).foreach { case (shard, docs) =>
      val bins = docs.map(_._3).distinct.sorted.toSeq
      assert(bins == (0L until bins.length.toLong).toSeq,
        s"shard=$shard bins=${bins.mkString(",")}")
    }
    // no doc could have fit in its bin's predecessor (greedy tightness):
    // within a shard, the doc that OPENS bin b+1 didn't fit in bin b
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val packed = out.filter(_._2 == shard).sortBy(_._1)
      packed.sliding(2).foreach {
        case Array((_, _, b1, _), (id2, _, b2, w2)) if b2 == b1 + 1 =>
          val binTotal = packed.filter(t => t._3 == b1).map(_._4).sum
          assert(binTotal + w2 > cap, s"shard=$shard doc=$id2 should have fit in bin $b1")
        case _ => ()
      }
    }
  }

  test("fillAudit: exact hand card; overflow-aware lower bound stays a bound") {
    // shard 0: w=[100,100,100] cap 256 -> bins {200, 100}; padding 56+156
    // shard 1: one overflow doc w=300 -> its own bin, no padding charge
    val packed = Packing.packGreedy(
      Seq((0L, 1L, 100L), (0L, 2L, 100L), (0L, 3L, 100L), (1L, 9L, 300L))
        .toDF("shard", "doc_id", "w"),
      col("doc_id"), col("w"), col("shard"), 256L)
    val r = Packing.fillAudit(packed, 256L).collect().head
    assert(r.getLong(0) == 3L, s"n_bins: $r")          // 2 + 1
    assert(r.getLong(1) == 4L && r.getLong(2) == 600L, s"docs/tokens: $r")
    assert(r.getLong(3) == 212L, s"padding 56+156: $r")
    assert(r.getLong(4) == 1L, s"overflow bins: $r")
    // LB: shard0 ceil(300/256)=2, shard1 1 overflow doc -> 3 == actual
    assert(r.getLong(5) == 3L, s"lower bound: $r")
    assert(r.getAs[Long]("efficiency_ppm") == 1000000L, r.toString)
    // fill rate: 600 / (3*256) = 0.78125
    assert(r.getAs[Long]("fill_rate_ppm") == 781250L, r.toString)
  }

  test("fillAudit: efficiency never exceeds 10^6 (bound stays true)") {
    // heavy docs where naive ceil(tokens/cap) would overshoot actual bins
    val packed = Packing.packGreedy(
      Seq((0L, 1L, 500L), (0L, 2L, 500L)).toDF("shard", "doc_id", "w"),
      col("doc_id"), col("w"), col("shard"), 256L)
    val r = Packing.fillAudit(packed, 256L).collect().head
    assert(r.getLong(0) == 2L && r.getLong(5) == 2L, r.toString)
    assert(r.getAs[Long]("efficiency_ppm") == 1000000L, r.toString)
  }
}
