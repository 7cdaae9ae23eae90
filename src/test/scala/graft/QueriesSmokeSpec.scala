package graft

/** Every registered query runs end-to-end on sf0.001 and yields a sane
  * result. The DuckDB hash-match is the driver's job; this guards against
  * regressions (analysis errors, empty results) between rounds. */
class QueriesSmokeSpec extends SparkSpec {

  // Queries whose correct sf0.001 result may legitimately be small.
  private val mayBeSmall = Set("q36_lsh_neardup", "q37_jaccard_pairs")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val n = q.run(spark, sfDir).count()
      if (!mayBeSmall(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      else assert(n >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key corresponds to a registered query") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }
}
