package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Byte-balanced sharding: assign each row (in `orderCol`'s total
    * order) to the shard its EXCLUSIVE byte prefix falls in —
    * `shard_id = (running − bytes) div targetBytes` over the
    * distributed prefix sum, so shards carry ~targetBytes each
    * regardless of document-length skew ([[withShard]]'s hash
    * assignment balances COUNTS; a long-document source would give it
    * fat shards, and trainers want equal-byte units). Contract per
    * shard: bytes ≤ targetBytes + max single-row bytes (a row
    * straddling a boundary lands wholly in the shard where it starts);
    * ids are contiguous from 0 and non-decreasing in the order. Exact
    * long arithmetic end to end (`bytesCol` must be non-negative — div
    * vs `//` diverge on negatives); one range exchange (the prefix
    * sum's), everything after is a projection. */
  def shardByBytes(df: DataFrame, orderCol: Column, bytesCol: Column,
                   targetBytes: Long,
                   scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    Relational.prefixSum(df.withColumn("_bytes", bytesCol.cast("long")),
        orderCol, col("_bytes"), scope = scope)
      .withColumn("shard_id",
        expr(s"(running - _bytes) div cast($targetBytes as bigint)"))
      .drop("_bytes")
  }

  /** Per-source data card: the human-facing release summary a dataset
    * publication ships next to the shard manifest — for every source,
    * volume (`n_docs`, `n_chars`, corpus `share_ppm`), language profile
    * (`n_langs`, the majority `major_lang` + its `major_lang_ppm`),
    * length shape (exact interpolated `median_chars`), and the
    * exact-duplicate rate (`exact_dup_ppm` via distinct
    * portableHash(text) — the 8-byte cardinality discipline; a 60-bit
    * hash undercounts dups with probability ~2⁻⁶⁰ per pair, irrelevant
    * for a release statistic and identical in both engines).
    *
    * Majority-language election is max-struct over (count, lang) — the
    * deterministic tie-break every election in this codebase uses; its
    * DuckDB twin is `arg_max(lang, lpad(count) || lang)` (fixed-width
    * lexicographic = the same order).
    *
    * Scale shape: three corpus passes, each a map-side-combinable
    * aggregation — to |sources|, |sources × langs|, and (for the
    * median) |sources × distinct lengths| rows — with column pruning
    * keeping each pass to the columns it needs (the distinct-hash
    * shuffle carries (source, hash) longs, never text); the ppm
    * arithmetic is the exact staged integer ratio
    * ([[Sampling.microRatioSql]]) against a 1-row broadcast total. The
    * |sources|-row stats frame is persisted via `scope` — two plan
    * branches read it (the total and the final join), and without the
    * persist the total branch re-scans the corpus again (Catalyst does
    * not reuse the exchange across the agg shapes).
    *
    * `median_chars` goes through [[Relational.groupedQuantilesExact]]
    * (same interpolated `quantile_cont` lerp), NOT Spark's
    * `percentile()` aggregate: a data card is by construction grouped
    * by SOURCE — a handful of giant groups — and the buffering
    * percentile holds every length of a group in one final task's
    * memory (billions of values for a dominant source at 100 TB; see
    * Relational.scala's OOM note). The exact formulation collapses to
    * per-distinct-length counts first, so per-group state is bounded by
    * |distinct lengths| (≤ a few million for any real length column)
    * regardless of group row count — the mega-source spec in
    * `ReleaseSpec` pins equality on a 1-source-dominates corpus.
    * `median_chars` is DOUBLE by contract (interpolated midpoint on
    * even counts) — consumers bucketing on it should round first. */
  def dataCard(df: DataFrame, sourceCol: Column, textCol: Column,
               langCol: Column,
               scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val base = df.select(sourceCol.as("source"), langCol.as("_lang"),
      length(textCol).cast("long").as("_nc"),
      TextFunctions.portableHash(textCol).as("_h"))
    val med = Relational.groupedQuantilesExact(
      base.select("source", "_nc"), "source",
      Seq(("_nc", 0.5, "median_chars")), scale = 1)
    val perSrc = scope.persist(base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("_nc").as("n_chars"),
      count_distinct(col("_lang")).as("n_langs"),
      count_distinct(col("_h")).as("n_unique")))
    val major = base.groupBy("source", "_lang")
      .agg(count(lit(1)).as("_cl"))
      .groupBy("source")
      .agg(max(struct(col("_cl"), col("_lang"))).as("_m"))
      .select(col("source"), col("_m._lang").as("major_lang"),
        col("_m._cl").as("_mc"))
    val total = perSrc.agg(sum("n_docs").cast("long").as("_t")) // 1 row
    perSrc.join(major, "source") // co-partitioned on source
      // LEFT: groupedQuantilesExact filters nulls, so a degenerate
      // source whose text is all NULL has no quantile row — it must
      // keep its card row with a null median_chars (what percentile()
      // did, and what the DuckDB twin's quantile_cont does), not vanish
      .join(med, Seq("source"), "left")
      .crossJoin(broadcast(total))
      .withColumn("major_lang_ppm",
        expr(Sampling.microRatioSql("_mc", "n_docs", "div")))
      .withColumn("_dups", col("n_docs") - col("n_unique"))
      .withColumn("exact_dup_ppm",
        expr(Sampling.microRatioSql("_dups", "n_docs", "div")))
      .withColumn("share_ppm",
        expr(Sampling.microRatioSql("n_docs", "_t", "div")))
      .select("source", "n_docs", "n_chars", "share_ppm", "n_langs",
        "major_lang", "major_lang_ppm", "median_chars", "exact_dup_ppm")
  }

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

  /** Per-source release DELTA card: the reviewer artifact for "what
    * changed between release A and B" — per source, the doc counts by
    * diff status (added / removed / changed / unchanged, the
    * [[Relational.snapshotDiff]] statuses) plus the byte movement:
    * `bytes_added` (payload bytes of added docs), `bytes_removed`
    * (bytes of removed docs), and `bytes_delta` (Σ new−old over every
    * doc — changed docs contribute their growth/shrinkage). A release
    * review reads this next to [[dataCard]]: the card says what a
    * release IS, the delta says what the new one DID.
    *
    * Byte columns are true OCTET counts (`octet_length`): multi-byte
    * UTF-8 payloads report their encoded size, which is what "byte
    * movement" on a release card must mean (a char count would
    * undercount non-ASCII corpora).
    *
    * CONTRACT: `keyCol` must be unique within EACH snapshot — the diff
    * is keyed set arithmetic and a duplicated key has no single
    * old→new story. Rather than let duplicates fan out through the
    * full-outer join and silently inflate every count, the operator
    * fails loudly: a `count(*) over (partition by key)` window —
    * free, because the join's output is already hash-partitioned (and
    * under SMJ sorted) by `key` — detects any key that produced more
    * than one joined row (unique keys produce exactly one) and raises
    * with the offending key.
    *
    * Scale shape: one full-outer equi-join on the id over narrow
    * `(id, source, payload, len)` projections — the payload column
    * enters only the null-safe equality, bodies never shuffle twice —
    * then a map-side-combinable rollup to |sources| rows. A source's
    * name comes from the NEW side when present (renames surface as
    * added+removed, which is the honest reading). */
  def releaseDelta(oldDf: DataFrame, newDf: DataFrame, keyCol: Column,
                   sourceCol: Column, payloadCol: Column): DataFrame = {
    def side(df: DataFrame, p: String) =
      df.select(keyCol.as("key"), sourceCol.as(s"${p}s"),
        payloadCol.as(s"${p}v"),
        octet_length(payloadCol).cast("long").as(s"${p}b"))
    val fan = count(lit(1)).over(Window.partitionBy(col("key")))
    val j = side(oldDf, "o").join(side(newDf, "n"), Seq("key"), "full_outer")
      .withColumn("_fan", fan)
      .withColumn("status",
        when(col("_fan") > 1, raise_error(concat(
          lit("releaseDelta: duplicate key in a snapshot violates the "
            + "unique-key contract; key="), col("key").cast("string"))))
          .when(col("os").isNull, lit("added"))
          .when(col("ns").isNull, lit("removed"))
          .when(!(col("ov") <=> col("nv")), lit("changed"))
          .otherwise(lit("unchanged")))
    def n(st: String) = sum(when(col("status") === st, 1L).otherwise(0L))
    j.groupBy(coalesce(col("ns"), col("os")).as("source"))
      .agg(n("added").as("added_docs"), n("removed").as("removed_docs"),
        n("changed").as("changed_docs"), n("unchanged").as("unchanged_docs"),
        sum(when(col("status") === "added", col("nb")).otherwise(0L))
          .as("bytes_added"),
        sum(when(col("status") === "removed", col("ob")).otherwise(0L))
          .as("bytes_removed"),
        sum(coalesce(col("nb"), lit(0L)) - coalesce(col("ob"), lit(0L)))
          .as("bytes_delta"))
  }
}
