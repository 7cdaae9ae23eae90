package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer artifact persistence — the production flow is train ONCE on
  * the corpus, persist the artifact, then encode trillions of tokens
  * across many jobs from the stored model (the reference persists its
  * ML pipelines the same way, reference: code/ml/ML_Modeling.py
  * save/load; tokenizers deserve the identical contract).
  *
  * Artifacts are plain parquet tables — readable by ANY engine (the
  * DuckDB oracle could re-load them), diffable across training runs,
  * and tiny (vocab-sized, the driver-side-by-contract bound every
  * tokenizer here already relies on). Ordering columns make reloads
  * deterministic: BPE merges are ORDER-sensitive (applied in learned
  * sequence, hence the `it` column); WordPiece/unigram vocabularies are
  * set-shaped and reload sorted.
  *
  * Layout under `dir`:
  *  - `<dir>/meta.parquet`    — (family, k) one row
  *  - `<dir>/model.parquet`   — family-specific columns (see below)
  *
  * Write order is MODEL FIRST, META LAST on every save path: `readMeta`
  * is the first thing every load does, so meta doubles as a cheap commit
  * marker — a save that dies mid-way leaves a missing/stale meta (load
  * fails loudly) rather than a torn artifact with valid meta over a
  * missing model.
  */
object TokenizerIO {

  val FamilyBpe = "bpe"
  val FamilyByteBpe = "byte_bpe"
  val FamilyWordPiece = "wordpiece"
  val FamilyUnigram = "unigram"

  private def writeMeta(spark: SparkSession, dir: String, family: String,
                        k: Int): Unit = {
    import spark.implicits._
    Seq((family, k)).toDF("family", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  private def readMeta(spark: SparkSession, dir: String): (String, Int) = {
    val r = spark.read.parquet(s"$dir/meta.parquet").head()
    (r.getString(0), r.getInt(1))
  }

  private def requireFamily(got: String, want: String, dir: String): Unit =
    require(got == want,
      s"tokenizer artifact at $dir is family '$got', expected '$want' — " +
        "refusing to misread a model (fail-loud contract)")

  // ---- BPE / byte-BPE merge tables ---------------------------------------

  /** Persist an ordered merge table (char-level or byte-level BPE). */
  def saveMerges(spark: SparkSession, dir: String,
                 merges: Seq[(String, String)],
                 family: String = FamilyBpe): Unit = {
    import spark.implicits._
    require(family == FamilyBpe || family == FamilyByteBpe,
      s"saveMerges takes a BPE family, got '$family'")
    merges.zipWithIndex.map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("it", "pa", "pb")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model.parquet")
    writeMeta(spark, dir, family, merges.size)
  }

  /** Reload a merge table in learned order. */
  def loadMerges(spark: SparkSession, dir: String,
                 family: String = FamilyBpe): Seq[(String, String)] = {
    requireFamily(readMeta(spark, dir)._1, family, dir)
    spark.read.parquet(s"$dir/model.parquet")
      .orderBy("it").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  // ---- WordPiece vocabulary ----------------------------------------------

  def saveWordPiece(spark: SparkSession, dir: String,
                    vocab: Seq[String]): Unit = {
    import spark.implicits._
    vocab.toDF("piece")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model.parquet")
    writeMeta(spark, dir, FamilyWordPiece, vocab.size)
  }

  def loadWordPiece(spark: SparkSession, dir: String): Seq[String] = {
    requireFamily(readMeta(spark, dir)._1, FamilyWordPiece, dir)
    spark.read.parquet(s"$dir/model.parquet")
      .orderBy("piece").collect().map(_.getString(0)).toSeq
  }

  // ---- Unigram-LM scored vocabulary --------------------------------------

  /** Persist the (piece, score_micro) frame [[UnigramLm.train]] returns.
    * Stored distributed (no coalesce): a production unigram vocab can be
    * 100k+ rows and the consumer ([[UnigramLm.encode]]) takes a FRAME,
    * not a driver seq. `k` is counted from the WRITTEN files, not from a
    * separate `scores.count()` action: an expensive/nondeterministic
    * scores plan would otherwise execute twice and meta.k could disagree
    * with the rows actually persisted. */
  def saveUnigram(scores: DataFrame, dir: String): Unit = {
    val spark = scores.sparkSession
    scores.select(col("piece"), col("score_micro"))
      .write.mode("overwrite").parquet(s"$dir/model.parquet")
    writeMeta(spark, dir, FamilyUnigram,
      spark.read.parquet(s"$dir/model.parquet").count().toInt)
  }

  def loadUnigram(spark: SparkSession, dir: String): DataFrame = {
    requireFamily(readMeta(spark, dir)._1, FamilyUnigram, dir)
    spark.read.parquet(s"$dir/model.parquet")
  }
}
