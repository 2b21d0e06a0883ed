package graft

/** Every registered query must plan and return rows on the smallest scale
  * factor (the detailed value check is the driver's DuckDB oracle — see
  * tools/compare.py for the local replica). */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      try assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
      // queries persist intermediates they cannot unpersist (lazy
      // bodies); drop them so 100+ smoke tests don't accumulate blocks
      // and later suites in the same session see a cold catalog
      finally spark.catalog.clearCache()
    }
  }

  test("query names are unique across registries (Map ++ would silently shadow)") {
    import graft.queries._
    val parts = Seq(CoreQueries.defs, ExtQueries.defs, RelQueries.defs,
      TextQueries.defs, EmbeddingQueries.defs, MultimodalQueries.defs,
      CurationQueries.defs, StreamQueries.defs)
    assert(parts.map(_.size).sum == SparkEntry.queries.size,
      "duplicate query name across def maps — a registry entry was overwritten")
  }

  test("every query has oracle SQL unless explicitly non-SQL-expressible") {
    // Explicit allowlist, currently empty: even the mapPartitions-based
    // multimodal decode oracles via the decimal-folded stub. A new query
    // missing from oracleSql fails here.
    val allowedNoOracle = Set.empty[String]
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == allowedNoOracle,
      s"oracle coverage drifted: missing=${noOracle -- allowedNoOracle} " +
        s"unexpectedly-present=${allowedNoOracle -- noOracle}")
  }
}
