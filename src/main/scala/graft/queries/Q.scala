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
