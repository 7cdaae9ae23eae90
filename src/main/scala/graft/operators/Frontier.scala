package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Crawl-frontier expansion — the web-family composite that closes the
  * crawl loop: fetched pages carry outlinks; the frontier is the set of
  * canonical link targets NOT yet crawled, with per-URL discovery
  * stats for prioritization. Composes the existing web primitives:
  * href extraction (the q114 HTML machinery's sibling), URL
  * canonicalization (q115's [[TextFunctions.canonicalizeUrl]] — dedup
  * BEFORE fetch, the cheapest dedup a crawler has), and the
  * bloom-accelerated anti-join against the crawled index
  * ([[Relational.bloomAntiJoin]], the q89 stored-index discipline).
  *
  * Scale shape (100 TB crawl): link extraction/canonicalization are one
  * codegen'd map-side pass; the per-URL aggregation is the single
  * frontier-scale shuffle (map-side combinable counts); the crawled-index
  * check bloom-bypasses the overwhelmingly-new fraction so only
  * might-be-seen URLs pay the anti-join exchange. No all-pairs shapes
  * anywhere.
  */
object Frontier {

  /** All `href="…"` targets of an HTML page, document order. Attribute
    * extraction wants the raw markup — run BEFORE any tag stripping
    * ([[TextFunctions]]'s HTML extraction destroys the attributes). Same
    * Java ∩ RE2 regex discipline as the HTML/URL families, so the DuckDB
    * twin matches byte-for-byte. */
  val HrefRe = "(?i)href=\"([^\"]*)\""

  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(HrefRe), lit(1))

  def extractLinksSql(e: String): String =
    s"regexp_extract_all($e, '$HrefRe', 1)"

  /** Absolute-http(s) links only: a crawler resolves relative links
    * against the page URL — out of scope here (the reference pipelines
    * carry absolute URLs) — and schemes like `mailto:`/`javascript:`
    * are never fetchable. */
  val AbsoluteHttpRe = "(?i)^https?://"

  /** Disallow prefixes of a robots.txt's `User-agent: *` group(s) — the
    * subset of the robots exclusion protocol a generic crawler honors.
    * Sections split on the literal `User-agent:` header; a section
    * applies iff its agent token is `*`; each applying section
    * contributes its `Disallow:` values (rules for named agents are
    * deliberately NOT honored — the spec plants a decoy section to pin
    * that). Returns `array<string>` of path prefixes. Per-row HOF
    * lambdas are fine here: robots files are KB-sized and
    * host-cardinality, never corpus-scale. */
  def robotsStarDisallows(robotsTxt: Column): Column =
    flatten(transform(
      filter(split(robotsTxt, "User-agent:"),
        s => ltrim(s).startsWith("*")),
      s => regexp_extract_all(s, lit(RobotsDisallowRe), lit(1))))

  val RobotsDisallowRe = "(?i)Disallow:[ \\t]*([^\\s]+)"

  /** DuckDB twin of [[robotsStarDisallows]] (same split, same section
    * rule, same extraction regex). */
  def robotsStarDisallowsSql(e: String): String =
    "flatten(list_transform(" +
      s"list_filter(string_split($e, 'User-agent:'), " +
      "s -> starts_with(ltrim(s), '*')), " +
      s"s -> regexp_extract_all(s, '$RobotsDisallowRe', 1)))"

  /** Robots gate over an expanded frontier: each URL is `allowed` iff NO
    * `User-agent: *` Disallow prefix of its host's robots.txt
    * prefix-matches its path. `robots` is host-cardinality — broadcast
    * — so the gate is one map-side join + per-URL bool aggregate; the
    * frontier never reshuffles. Keeps every URL with its verdict (a
    * crawler records blocked URLs; silently dropping them loses the
    * audit trail). */
  def robotsGate(frontier: DataFrame,
                 robots: DataFrame, hostCol: Column, txtCol: Column): DataFrame = {
    val rules = robots.select(hostCol.as("host"),
      explode(robotsStarDisallows(txtCol)).as("dis"))
    frontier
      .withColumn("host", TextFunctions.urlHost(col("url")))
      .withColumn("path",
        regexp_replace(col("url"), TextFunctions.UrlHeadRe, ""))
      .join(broadcast(rules), Seq("host"), "left")
      .groupBy("url", "host", "n_refs", "n_pages")
      .agg((!max(col("dis").isNotNull &&
        col("path").startsWith(col("dis")))).as("allowed"))
  }

  /** Per-host fetch budget over an expanded frontier — the politeness /
    * scheduling quota: at most `k` URLs per host per crawl round, the
    * best-evidenced first (`n_pages` desc — distinct referring pages is
    * the robust in-degree prior; `n_refs`, then `url` break ties
    * deterministically). One window over `host`; Spark plans the
    * rank-≤-k filter as WindowGroupLimit, so per-host state is the
    * top-k heap, not the host's whole frontier (the q123 quota
    * discipline — the spec plan-asserts it). */
  def hostBudget(frontier: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"host budget must be >= 1, got $k")
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("n_pages").desc, col("n_refs").desc, col("url"))
    frontier
      .withColumn("host", TextFunctions.urlHost(col("url")))
      .withColumn("rk", row_number().over(byHost))
      .filter(col("rk") <= k)
      .select(col("host"), col("url"), col("n_refs"), col("n_pages"),
        col("rk").cast("long").as("rk"))
  }

  /** Frontier expansion: `pages (src_url, html)` × `crawled (url)` →
    * `(url, n_refs, n_pages)` for every canonical outlink target not in
    * the crawled index — `n_refs` total references, `n_pages` distinct
    * referring pages (the in-degree prior a frontier scheduler ranks
    * by). `crawled` must already hold CANONICAL urls (it is the output
    * of previous rounds of this very loop). */
  def expand(pages: DataFrame, srcUrlCol: Column, htmlCol: Column,
             crawled: DataFrame, crawledUrlCol: Column,
             scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // persisted: the bloom anti-join reads the aggregated frontier twice
    // (proven-new bypass + candidate branch) — persist the SMALL
    // aggregated frame, never the raw link explosion
    val agg = scope.persist(discovered(pages, srcUrlCol, htmlCol))
    Relational.bloomAntiJoin(agg, col("url"),
      crawled.select(crawledUrlCol.as("url")), col("url"))
  }

  /** Link-discovery half of [[expand]]: extraction, absolute-http
    * filter, canonicalization, per-URL stats — everything but the
    * crawled-index check. Shared with [[runFrontierStream]]. */
  def discovered(pages: DataFrame, srcUrlCol: Column, htmlCol: Column): DataFrame =
    pages
      .select(srcUrlCol.as("src"), explode(extractLinks(htmlCol)).as("link"))
      .filter(col("link").rlike(AbsoluteHttpRe))
      .select(col("src"), TextFunctions.canonicalizeUrl(col("link")).as("url"))
      .groupBy("url")
      .agg(count(lit(1)).as("n_refs"), countDistinct(col("src")).as("n_pages"))

  /** The crawl loop as a STREAM: fetched pages arrive continuously, each
    * microbatch's discovered URLs are bloom-anti-joined against the
    * ACCUMULATING crawled index (seeded from whatever `crawledDir`
    * already holds, grown with every batch's emissions) and appended to
    * `frontierDir` — every canonical URL emits exactly once, at first
    * discovery, with that batch's evidence stats. This is
    * [[graft.streaming.EventsStream.runToParquetDedup]]'s merge-on-write
    * discipline applied to the frontier: the per-batch index read is
    * key-only, the anti-join is bloom-bypassed, and a replayed batch
    * re-emits nothing (idempotent at-least-once → effectively-once).
    * Production streams pass a durable checkpoint via their own
    * harness; this runner drives the stream to completion for
    * tests/local use. */
  def runFrontierStream(pages: DataFrame, srcUrlCol: Column, htmlCol: Column,
                        crawledDir: String, frontierDir: String): Unit = {
    import graft.streaming.EventsStream
    val spark = pages.sparkSession
    val ckpt = EventsStream.tempCkpt("graft-frontier-ckpt")
    try {
      val q = pages.writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val agg = discovered(batch, srcUrlCol, htmlCol)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val crawled =
              try Some(spark.read.parquet(crawledDir).select("url"))
              catch { case _: org.apache.spark.sql.AnalysisException => None }
            val fresh = crawled.fold(agg: DataFrame)(c =>
              Relational.bloomAntiJoin(agg, col("url"), c, col("url")))
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              fresh.write.mode("append").parquet(frontierDir)
              fresh.select("url").write.mode("append").parquet(crawledDir)
            } finally fresh.unpersist(false)
          } finally agg.unpersist(false)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    } finally EventsStream.deleteRecursively(ckpt)
  }
}
