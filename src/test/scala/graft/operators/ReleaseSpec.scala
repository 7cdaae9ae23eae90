package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ReleaseSpec extends SparkSpec {

  private val d = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("writeRelease: files on disk re-derive the exact returned manifest") {
    val dir = Files.createTempDirectory("graft_release").toString
    val m = Release.writeRelease(d, col("doc_id"), col("text"), 8, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // every shard directory exists and re-reading reproduces the manifest
    val back = spark.read.parquet(dir)
    val m2 = Release.manifest(back, col("doc_id"), col("text"), 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(m === m2)
    assert(m.keySet === (0L until 8L).toSet)
    assert(m.values.map(_._1).sum === d.count())
    // partition directories are per-shard fetchable units
    (0 until 8).foreach { s =>
      assert(Files.exists(java.nio.file.Paths.get(dir, s"shard=$s")), s"shard $s")
    }
  }

  test("sharding is content-stable: input order and partitioning don't move docs") {
    val a = Release.manifest(d, col("doc_id"), col("text"), 8)
      .collect().map(_.toString).sorted.toSeq
    val shuffled = d.orderBy(rand(42)).repartition(3)
    val b = Release.manifest(shuffled, col("doc_id"), col("text"), 8)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("checksum catches a corrupted row") {
    val m = Release.manifest(d, col("doc_id"), col("text"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val corrupted = d.withColumn("text",
      when(col("doc_id") === d.select(min("doc_id")).head.getLong(0),
        concat(col("text"), lit("x"))).otherwise(col("text")))
    val mc = Release.manifest(corrupted, col("doc_id"), col("text"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m !== mc)
    // and only the corrupted doc's shard moved
    assert(m.count { case (k, v) => mc(k) != v } === 1)
  }
}
