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
}
