package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** TF-IDF re-expressed as DataFrame aggregates (SURVEY.md §2.10, §3 E3).
  *
  * The reference computes this with a 4-shuffle RDD pipeline through Python
  * lambdas (reference: code/nlp/NFL_Processing.py:459-494). Here it is
  * explode → 2 hash aggregates → broadcast-joined IDF → window top-k:
  * 3 shuffles, fully whole-stage-codegen'd.
  *
  * The reference hard-codes N=7511 docs into its IDF — correct for its NFL
  * corpus, silently wrong when reused on the 619k-doc Yankees corpus
  * (code/nlp/Yankees_Processing_with_NLP.py:628). We always derive N from
  * the corpus itself (countDistinct), the documented divergence.
  */
object TfIdf {

  /** Per-(doc, token) TF, IDF = log10(N/df), score = tf·idf.
    *
    * Single corpus pass over raw text: `tf` is the only aggregation that
    * explodes tokens; `df` (docs-per-token) derives from `tf`, which
    * already holds one row per distinct (doc, token) — re-exploding the
    * corpus for it would double the scan (27s → 10s on 100k docs).
    * tf is cached for its two consumers.
    *
    * N is counted from the *input* frame (a column-pruned scan of the doc
    * ids, broadcast as a 1-row frame — still fully lazy): counting it from
    * `tf` would silently exclude docs whose token array is NULL/empty — a
    * latent IDF divergence vs a corpus-level oracle. */
  def tfidf(df: DataFrame, docCol: Column, toksCol: Column): DataFrame = {
    val n = df.select(countDistinct(docCol).as("n_docs"))
    val tf = df.select(docCol.as("doc"), explode(toksCol).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
      .cache()
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // dfreq and n are tiny post-aggregation — broadcast both so tf never
    // reshuffles: its (doc,token) grouping already co-locates rows.
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .withColumn("idf", log10(col("n_docs").cast("double") / col("df")))
      .withColumn("tfidf", col("tf") * col("idf"))
  }

  /** Reference query shape: top-k tokens per document by TF-IDF
    * (code/nlp/NFL_Processing.py:504-506), deterministic via token
    * tie-break on a micro-rounded score. */
  def topKPerDoc(df: DataFrame, docCol: Column, toksCol: Column, k: Int): DataFrame =
    Relational.topKPerGroup(
      tfidf(df, docCol, toksCol),
      Seq(col("doc")),
      Seq(round(col("tfidf"), 6).desc, col("token")), k)
}
