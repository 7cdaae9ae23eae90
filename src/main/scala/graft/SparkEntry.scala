package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ChatQueries, CorpusQueries, DedupQueries, PipelineQueries, PrivacyQueries, Q, RelationalQueries, SimilarityQueries, StreamingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * `queries`; the DuckDB-runnable oracle for each lives in `oracleSql`
  * (absent only for ops not expressible in ANSI SQL, which the ScalaTest
  * suite covers instead).
  */
object SparkEntry {

  /** Full query registry (relational + text + dedup + similarity …). */
  val registry: Seq[Q] =
    RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      StreamingQueries.queries ++ PipelineQueries.queries ++
      CorpusQueries.queries ++ ChatQueries.queries ++ PrivacyQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join through three broadcast dims + grouped revenue — the engine's
    * reshape of the reference's dimension⋈fact chain (Data_Gathering.py:214). */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q08_join_dims").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
