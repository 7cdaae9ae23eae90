package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) source — the container format web-scale
  * corpora actually arrive in (Common Crawl ships ~100 TB/month of
  * `*.warc.gz`); the ingestion step that feeds [[JsonLines]]-shaped
  * document frames via `extractHtmlText` → quality gates → dedup.
  * (The reference ingests pre-extracted CSV — `Data_Processing.py:16` —
  * so this is extension surface, same family as the JSONL source.)
  *
  * Read strategy: one splittable text scan with the record header
  * `WARC/<version>\r\n` as the line separator — each split chunk is then
  * `<headers>\r\n\r\n<block>` parsed by codegen'd per-row expressions
  * (instr / substring / regexp_extract), no UDFs, no custom InputFormat.
  *
  * SCALE NOTES (the 100 TB contract):
  *  - an UNCOMPRESSED (or bzip2) `.warc` splits freely — `lineSep` text
  *    scans split at arbitrary byte offsets and re-sync on the record
  *    marker, so executors stream records without whole-file tasks;
  *  - a `.warc.gz` is one task per FILE (gzip is not splittable; Hadoop's
  *    decompressor handles the per-record-member concatenation Common
  *    Crawl uses, the file just decodes as one stream). That is exactly
  *    the real Common Crawl job shape: ~1 GB segment files, parallelism
  *    across the ~80k files of a crawl, never within one;
  *  - the content block is sliced by `Content-Length` in BYTES
  *    (encode → binary substring → decode), not characters — a multibyte
  *    page would otherwise drag the next record's headers into its tail;
  *  - known tradeoff of marker re-sync: a block whose PAYLOAD contains
  *    the exact byte sequence `WARC/1.0\r\n` splits early (a
  *    Content-Length-driven sequential reader would not). Real crawls
  *    make this vanishingly rare — HTML escapes CRLF-free markers poorly
  *    — and the affected record degrades to a filtered non-record chunk,
  *    never to silently corrupted neighbors.
  */
object Warc {

  /** WARC named fields surfaced as columns; everything else stays
    * available in the raw `headers` column. */
  private val HeaderSep = "\r\n\r\n"

  private def header(headers: Column, name: String): Column =
    regexp_extract(headers, s"(?mi)^$name: *([^\r\n]+)", 1)

  /** Parse a WARC file (or directory / glob; `.gz` transparent) into one
    * row per record:
    * `warc_type, warc_date (timestamp), record_id, target_uri,
    * content_type, content_length (long), headers (raw), block (string)`.
    * Records of every `WARC-Type` are kept (warcinfo / request /
    * response / metadata …) — filter downstream; [[responses]] is the
    * common one. */
  def read(spark: SparkSession, path: String, version: String = "1.0"): DataFrame = {
    val hEnd = instr(col("value"), HeaderSep) // 1-based; 0 = no header block
    val headers = substring(col("value"), lit(1), hEnd - 1)
    val rest = substring(col("value"), hEnd + lit(HeaderSep.length), length(col("value")))
    val cLen = header(col("headers"), "Content-Length").cast("long")
    // Content-Length counts BYTES: slice the block on the encoded form.
    // Records without a parseable length fall back to stripping the
    // record-terminating CRLF pair(s).
    val block = when(cLen.isNotNull,
        decode(substring(encode(col("rest"), "UTF-8"), lit(1), cLen), "UTF-8"))
      .otherwise(regexp_replace(col("rest"), "(\r\n)+$", ""))
    spark.read.option("lineSep", s"WARC/$version\r\n").text(path)
      // the split before the first record marker is empty; any chunk
      // without a header/block boundary is not a WARC record
      .filter(hEnd > 0)
      .select(headers.as("headers"), rest.as("rest"))
      .select(
        header(col("headers"), "WARC-Type").as("warc_type"),
        to_timestamp(header(col("headers"), "WARC-Date"),
          "yyyy-MM-dd'T'HH:mm:ssX").as("warc_date"),
        header(col("headers"), "WARC-Record-ID").as("record_id"),
        header(col("headers"), "WARC-Target-URI").as("target_uri"),
        header(col("headers"), "Content-Type").as("content_type"),
        cLen.as("content_length"),
        col("headers"),
        block.as("block"))
  }

  /** The HTTP body of a response/request block: everything after the
    * first blank line of the HTTP message; a block that is not an HTTP
    * message (warcinfo fields, metadata) passes through whole. */
  def httpBody(block: Column): Column = {
    val bEnd = instr(block, HeaderSep)
    when(block.startsWith("HTTP/") && bEnd > 0,
        substring(block, bEnd + lit(HeaderSep.length), length(block)))
      .otherwise(block)
  }

  /** Response records reduced to the document-pipeline shape:
    * `target_uri, warc_date, content_type, html` (the HTTP body).
    * Compose with `TextFunctions.extractHtmlText(col("html"))` and
    * `TextFunctions.canonicalizeUrl` for the ingest front half. */
  def responses(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"), col("warc_date"), col("content_type"),
        httpBody(col("block")).as("html"))
}
