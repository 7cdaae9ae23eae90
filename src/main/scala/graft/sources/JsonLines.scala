package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL (newline-delimited JSON) source/sink — the interchange format of
  * LLM training-data pipelines (public corpora ship as `*.jsonl`). The
  * read is a splittable text scan + `from_json`, which is exactly what
  * Spark's json datasource lowers to, with two policies fixed for 100 TB:
  *
  *  - **explicit schema, never inference** — schema inference is a full
  *    extra pass over the corpus before the real one;
  *  - **malformed-line quarantine** — one bad line in a billion must
  *    neither fail the batch nor silently vanish; it surfaces in a
  *    `_corrupt` column carrying the raw line with full fidelity.
  *    (Spark's own PERMISSIVE reader forbids querying its corrupt-record
  *    column alone — [UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]
  *    — so the badRecords accounting a pipeline needs can't be built on
  *    it; parsing explicitly keeps the quarantine a plain column.)
  */
object JsonLines {

  /** documents-table schema (the parsed columns; `_corrupt` is added by
    * [[readDocuments]], not part of the data schema). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Distributed JSONL write — one file per partition, like any sink.
    * `codec` e.g. "gzip" compresses each part file (the JDK ships the
    * codec; reads stay transparent). SCALE NOTE: a gzip part is NOT
    * splittable — one task per file on read — so a 100 TB corpus wants
    * many moderate parts (repartition before writing), not few huge
    * ones; uncompressed or bzip2 parts split freely. */
  def writeDocuments(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Schema'd quarantining read: well-formed lines parse into the declared
    * columns with `_corrupt` null; malformed lines yield all-null data
    * columns and `_corrupt` = the raw line. One text scan, one codegen'd
    * `from_json` per line, with the corrupt-record column declared INSIDE
    * the parse schema (PERMISSIVE `from_json` reports malformed input
    * there rather than returning a null struct). Lines `from_json`
    * returns a NULL STRUCT for — blank/whitespace-only lines and the
    * literal `null` — would otherwise slip through as phantom all-null
    * "clean" rows (null `_corrupt` too); they are folded into the
    * quarantine with the raw line, keeping the never-silently-vanish
    * contract airtight. */
  def readDocuments(spark: SparkSession, path: String): DataFrame = {
    val parseSchema = documentsSchema.add(StructField("_corrupt", StringType))
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")
    spark.read.text(path)
      .select(col("value"), from_json(col("value"), parseSchema, opts).as("_r"))
      .select(documentsSchema.fieldNames.map(f => col(s"_r.$f")) :+
        coalesce(col("_r._corrupt"),
          when(col("_r").isNull, col("value"))).as("_corrupt"): _*)
  }

  /** The clean rows of a [[readDocuments]] frame (quarantine removed). */
  def good(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNull).drop("_corrupt")

  /** The quarantined raw lines (malformed JSON, with full fidelity). */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNotNull).select("_corrupt")
}
