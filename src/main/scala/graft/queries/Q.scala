package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query paired with its DuckDB oracle SQL.
  *
  * `oracle = None` marks operators whose semantics aren't expressible in
  * ANSI SQL (engine-specific RNG, LSH banding, …) — the driver then records
  * a weaker rows-only check and the ScalaTest suite carries correctness.
  *
  * Oracle-parity rules (driver hashes values after sorting columns by name):
  *  - alias every computed column identically on both sides;
  *  - round floating aggregates (`round(x, 2..4)`) on both sides so
  *    summation-order ULP drift can't flip the hash;
  *  - cast where Spark/DuckDB result types diverge (DuckDB `sum(BIGINT)` →
  *    HUGEINT, `len()`/`year()` → BIGINT, Spark `size()`/`year()` → INT);
  *  - any LIMIT/top-k must carry a unique tie-breaker in its ordering.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** Deterministic host planting shared by the web-shaped queries
  * (q119/q122/q123): `hosts(doc_id % hosts.size)` as a when-chain
  * `Column` and its CASE-WHEN SQL twin — one definition so the two
  * engines (and the several queries) cannot drift. */
object PlantedHosts {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, when}

  def column(hosts: Seq[String]): Column = {
    val idx = col("doc_id") % hosts.size
    hosts.zipWithIndex.tail
      .foldLeft(when(idx === 0, lit(hosts.head))) {
        case (c, (h, i)) => c.when(idx === i, lit(h))
      }
  }

  def caseSql(hosts: Seq[String]): String =
    s"""CASE doc_id % ${hosts.size}
       |    ${hosts.zipWithIndex.map { case (h, i) =>
              s"WHEN $i THEN '$h'" }.mkString("\n    ")}
       |    END""".stripMargin
}
