package graft

/** The driver contract surface: entry() must return rows on a session the
  * driver owns (no special confs assumed), and every registered query name
  * has either an oracle or a deliberate rows-only status. */
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

  test("rows-only queries are the deliberately nondeterministic ones") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly == Set(
      "b17_uuid", "b3_filename_virtual", "llm_lang_quality",
      "llm_minhash_dedup", "llm_simhash_dedup", "llm_ngram_dedup",
      "llm_ann_lsh", "llm_ann_ivf", "llm_cosine_neardup"), rowsOnly)
  }
}
