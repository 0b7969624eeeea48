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
      queries.SqlSuiteQueries.queries, queries.GeoQueries.queries,
      queries.MultimodalQueries.queries)
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

  // ---- SURVEY.md ↔ catalog drift gate (round 11) -------------------------
  // The 900-line §2B ledger and the §5.2 rows-only inventory are graded
  // documents; these assertions make it impossible to add a query without a
  // ledger row, retire one and leave its row behind, or change a query's
  // oracle status without moving it in/out of the §5.2 inventory.

  private lazy val survey: String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")

  private lazy val rowsOnly: Set[String] =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  test("SURVEY Appendix A manifest equals the live catalog exactly") {
    val start = survey.indexOf("## Appendix A")
    assert(start >= 0, "SURVEY Appendix A (catalog manifest) not found")
    val entry = "- `(q_[a-z0-9_]+)` — (oracle|rows-only)".r
    val manifest = entry.findAllMatchIn(survey.substring(start))
      .map(m => m.group(1) -> m.group(2)).toMap
    val missing = SparkEntry.queries.keySet -- manifest.keySet
    assert(missing.isEmpty,
      s"catalog queries missing from the SURVEY manifest (add a line + a " +
        s"§2B row): $missing")
    val stale = manifest.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"SURVEY manifest lines for retired queries (remove them): $stale")
    val wrongStatus = manifest.collect {
      case (q, "oracle") if !SparkEntry.oracleSql.contains(q) => q
      case (q, "rows-only") if SparkEntry.oracleSql.contains(q) => q
    }
    assert(wrongStatus.isEmpty,
      s"manifest status diverges from SparkEntry.oracleSql: $wrongStatus")
  }

  test("§5.2 rows-only inventory is exactly the no-oracle query set") {
    val start = survey.indexOf("Rows-only inventory")
    val end = survey.indexOf("### 5.3")
    assert(start >= 0 && end > start, "SURVEY §5.2 inventory section not found")
    val section = survey.substring(start, end)
    val inventoried = "`(q_[a-z0-9_]+)`".r
      .findAllMatchIn(section).map(_.group(1)).toSet
    val missing = rowsOnly -- inventoried
    assert(missing.isEmpty,
      s"rows-only queries absent from the §5.2 inventory: $missing")
    val stale = inventoried -- rowsOnly
    assert(stale.isEmpty,
      s"§5.2 inventory rows that are not rows-only catalog queries " +
        s"(oracle added or query retired — remove the row): $stale")
  }

  test("§5.2 inventory headline counts match the catalog") {
    val m = "inventory \\(round \\d+\\): (\\d+) of (\\d+) queries".r
      .findFirstMatchIn(survey)
    assert(m.isDefined, "SURVEY §5.2 headline count sentence not found")
    assert(m.get.group(1).toInt === rowsOnly.size,
      s"§5.2 says ${m.get.group(1)} rows-only; catalog has ${rowsOnly.size}")
    assert(m.get.group(2).toInt === SparkEntry.queries.size,
      s"§5.2 says ${m.get.group(2)} total; catalog has ${SparkEntry.queries.size}")
  }

  test("SURVEY never marks a rows-only query hash-exact (✓) in the ledger") {
    // a `q_name` immediately annotated "hash-exact" or prefixed ✓ must have
    // an oracle; scan ledger lines for the ✓ `q_...` spelling
    val checked = "✓ `(q_[a-z0-9_]+)`".r.findAllMatchIn(survey)
      .map(_.group(1)).toSet ++
      "`(q_[a-z0-9_]+)` hash-exact".r.findAllMatchIn(survey)
        .map(_.group(1)).toSet
    val wrong = checked.intersect(rowsOnly)
    assert(wrong.isEmpty,
      s"SURVEY claims hash-exact for queries with no oracle: $wrong")
  }
}
