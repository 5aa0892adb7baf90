package graft

/** Driver-contract sanity: every declared query runs on sf0.001, returns
  * rows, and every oracle key points at a declared query (SURVEY.md §0.2).
  */
class ContractSpec extends SparkSpecBase {

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle SQL carries a total ORDER BY (determinism rule A)") {
    val missing = SparkEntry.oracleSql.collect {
      case (k, sql) if !sql.toUpperCase.contains("ORDER BY") => k
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  // Streaming rows get their own suite (they drive MemoryStream pipelines);
  // everything else must produce a non-empty deterministic result here.
  private val streamingKeys =
    SparkEntry.queries.keySet.filter(_.startsWith("s_stream"))

  for (name <- SparkEntry.queries.keySet.diff(streamingKeys).toSeq.sorted) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
