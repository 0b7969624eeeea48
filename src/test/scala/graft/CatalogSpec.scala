package graft

/** Catalog invariants the driver contract depends on. */
class CatalogSpec extends SparkSpec {

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no duplicate query names across families") {
    val fams = Seq(
      queries.RelationalQueries.queries, queries.JoinQueries.queries,
      queries.AggQueries.queries, queries.WindowQueries.queries,
      queries.FunctionQueries.queries, queries.LlmQueries.queries,
      queries.CurationQueries.queries, queries.WebQueries.queries,
      queries.RetrievalQueries.queries, queries.AnalyticsQueries.queries,
      queries.StreamingQueries.queries, queries.GenomicsQueries.queries,
      queries.SqlSuiteQueries.queries, queries.GeoQueries.queries)
    val total = fams.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"name collision: union=${SparkEntry.queries.size} sum=$total")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL never uses nondeterministic functions") {
    val banned = Seq("rand(", "random(", "uuid(", "current_date", "now()")
    for ((name, sql) <- SparkEntry.oracleSql; b <- banned)
      assert(!sql.toLowerCase.contains(b), s"$name uses $b")
  }
}
