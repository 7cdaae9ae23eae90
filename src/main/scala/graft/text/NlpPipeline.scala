package graft.text

import org.apache.spark.ml.feature.{StopWordsRemover, StringIndexer}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.PorterStem

/** The reference's Spark NLP text pipeline (DocumentAssembler → Tokenizer →
  * Normalizer → StopWordsCleaner → Stemmer → Finisher, reference:
  * code/nlp/NFL_Processing.py:143-183, 402-449) re-expressed as plain
  * DataFrame column transforms + MLlib transformers — no external NLP
  * dependency, everything except StopWordsRemover stays in codegen.
  */
object NlpPipeline {

  /** Tokenize on whitespace (Tokenizer). */
  def tokenize(text: Column): Column = TextFunctions.tokens(text)

  /** Normalizer semantics: lowercase + strip non-word/digit characters,
    * drop tokens that become empty (NFL_Processing.py:151-156). */
  def normalize(toks: Column): Column =
    filter(
      transform(toks, t => regexp_replace(lower(t), "[^\\p{L}\\p{N}]", "")),
      t => t =!= "")

  /** StopWordsCleaner → MLlib StopWordsRemover (case-insensitive English
    * list, NFL_Processing.py:158-161). */
  def removeStopwords(df: DataFrame, inCol: String, outCol: String): DataFrame =
    new StopWordsRemover()
      .setInputCol(inCol).setOutputCol(outCol)
      .setCaseSensitive(false)
      .transform(df)

  /** Porter stemmer over a token array — the codegen'd [[PorterStem]]
    * expression mapped across the array. */
  def stemTokens(toks: Column): Column =
    transform(toks, t => Bridge.column(PorterStem(Bridge.expression(t))))

  def stemToken(t: Column): Column =
    Bridge.column(PorterStem(Bridge.expression(t)))

  /** Full clean pipeline: text → tokens → normalized → stopword-free →
    * stemmed (the Finisher's array<string> output shape). */
  def clean(df: DataFrame, textCol: Column): DataFrame = {
    val tokenized = df.withColumn("tokens_raw", normalize(tokenize(textCol)))
    removeStopwords(tokenized, "tokens_raw", "tokens_nostop")
      .withColumn("tokens", stemTokens(col("tokens_nostop")))
      .drop("tokens_raw", "tokens_nostop")
  }

  /** Label indexing (StringIndexer, frequency-desc — NFL_Processing.py:170). */
  def indexLabel(df: DataFrame, inCol: String, outCol: String): DataFrame =
    new StringIndexer().setInputCol(inCol).setOutputCol(outCol)
      .setStringOrderType("frequencyDesc")
      .fit(df).transform(df)
}
