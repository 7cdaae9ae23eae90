package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dataset release: the publish step every curation pipeline ends with —
  * deterministic sharding plus a verifiable MANIFEST, so a consumer can
  * (a) fetch a stable shard layout and (b) prove bytes arrived intact
  * without re-reading the corpus.
  *
  *  - Shard assignment is `portableHash(id) % shards` — a pure function
  *    of content identity, so re-running the release on the same corpus
  *    reproduces the same shards bit-for-bit regardless of partitioning,
  *    cluster size, or input order (the q66 hash-split discipline applied
  *    to layout).
  *  - The manifest row per shard carries `(n_docs, n_chars, checksum)`
  *    where the checksum is the SUM of per-row
  *    `portableHash(text) % 2^30` — order-insensitive (sum is
  *    commutative, so shuffle nondeterminism can't move it) and
  *    overflow-safe by construction: 2^30-bounded terms keep int64 sums
  *    exact to ~2^33 rows per shard, far past any real shard, and the
  *    same arithmetic replays in DuckDB without HUGEINT divergence.
  *    It is a transport/processing checksum, not a cryptographic
  *    commitment — the md5-based term hash makes accidental collisions
  *    ~2^-30 per pair, ample for release verification.
  *
  * Scale shape: one map-side-combinable aggregation (shards-sized
  * output); the write is `partitionBy(shard)` parquet, each shard a
  * directory a consumer can fetch independently. */
object Release {

  /** 2^30 — the per-term checksum bound (see object doc). */
  val ChecksumBound: Long = 1L << 30

  def withShard(df: DataFrame, idCol: Column, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.withColumn("shard",
      pmod(TextFunctions.portableHash(idCol.cast("string")), lit(shards.toLong)))
  }

  /** Per-shard manifest of `df` under the deterministic assignment. */
  def manifest(df: DataFrame, idCol: Column, textCol: Column,
               shards: Int): DataFrame =
    withShard(df, idCol, shards)
      .select(col("shard"), length(textCol).cast("long").as("n_chars"),
        (TextFunctions.portableHash(textCol) % ChecksumBound).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        sum("h").as("checksum"))

  /** Write the sharded release and return its manifest: parquet
    * partitioned by `shard` under `dir`, one fetchable directory per
    * shard. The manifest is computed from the SAME frame that fed the
    * writer; `ReleaseSpec` closes the loop by re-reading the files and
    * re-deriving an identical manifest. */
  def writeRelease(df: DataFrame, idCol: Column, textCol: Column,
                   shards: Int, dir: String): DataFrame = {
    val sharded = withShard(df, idCol, shards)
    sharded.write.partitionBy("shard").mode("overwrite").parquet(dir)
    manifest(df, idCol, textCol, shards)
  }
}
