package graft

/** The driver contract surface: entry() must return rows on a session the
  * driver owns (no special confs assumed), and every registered query name
  * carries a DuckDB oracle — since round 4 the nondeterministic operators
  * grade constant-row summaries (planted-dup counts, recall bounds,
  * contract invariants) instead of going rows-only. */
class SparkEntrySpec extends SparkSpec {

  test("entry() flagship runs the full lifecycle and returns rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.toSeq == Seq("l_returnflag", "cnt", "sum_qty"))
  }

  test("every oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query carries an oracle (no rows-only checks left)") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly.isEmpty, s"queries without oracles: $rowsOnly")
  }
}
