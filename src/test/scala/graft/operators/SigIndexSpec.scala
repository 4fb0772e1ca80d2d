package graft.operators

import graft.SparkSpec
import graft.ice.IceTable
import org.apache.spark.sql.functions._

class SigIndexSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("sigidx").toString

  private val history = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "spark executes distributed dataframe queries with catalyst and tungsten"),
    (3L, "completely unrelated text about cooking pasta with fresh tomatoes"))
    .toDF("doc_id", "text")

  test("batch near-dup of history is found; novel text is not") {
    val bands = new IceTable(spark, newRoot(), SigIndex.bandConfig)
    val sigs = new IceTable(spark, newRoot(), SigIndex.sigConfig)
    SigIndex.append(bands, sigs, history, "doc_id", "text")
    val batch = Seq(
      // one word changed from doc 1: high shingle overlap
      (100L, "the quick brown fox jumps over the lazy dog near the river shore"),
      (101L, "neural networks approximate functions with stacked linear layers"))
      .toDF("doc_id", "text")
    val got = SigIndex.nearDupsAgainstIndex(bands, sigs, batch,
      "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == Seq((100L, 1L)))
    assert(got.head._3 >= 0.5 && got.head._3 <= 1.0)
  }

  test("incremental rounds: history grows by append, never re-paired") {
    val bands = new IceTable(spark, newRoot(), SigIndex.bandConfig)
    val sigs = new IceTable(spark, newRoot(), SigIndex.sigConfig)
    SigIndex.append(bands, sigs, history.where($"doc_id" <= 2), "doc_id", "text")
    // round 2: batch contains a dup of doc 3 — NOT yet indexed: no match
    val b2 = Seq((200L,
      "completely unrelated text about cooking pasta with fresh tomatoes"))
      .toDF("doc_id", "text")
    assert(SigIndex.nearDupsAgainstIndex(bands, sigs, b2,
      "doc_id", "text", threshold = 0.5).count() == 0L)
    // index doc 3, compact, re-check: now it matches (exact text => est 1.0)
    SigIndex.append(bands, sigs, history.where($"doc_id" === 3), "doc_id", "text")
    bands.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    sigs.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val got = SigIndex.nearDupsAgainstIndex(bands, sigs, b2,
      "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((200L, 3L, 1.0)))
  }

  test("candidate cap bounds a hot bucket deterministically") {
    val bands = new IceTable(spark, newRoot(), SigIndex.bandConfig)
    val sigs = new IceTable(spark, newRoot(), SigIndex.sigConfig)
    // 50 identical history docs: every band bucket is hot
    val dup = (1L to 50L).map(i => (i, "identical text repeated many times over"))
      .toDF("doc_id", "text")
    SigIndex.append(bands, sigs, dup, "doc_id", "text")
    val batch = Seq((999L, "identical text repeated many times over"))
      .toDF("doc_id", "text")
    val got = SigIndex.nearDupsAgainstIndex(bands, sigs, batch,
      "doc_id", "text", threshold = 0.5, maxCandidatesPerDoc = 10)
      .collect().map(r => r.getLong(1))
    assert(got.length == 10 && got.toSet == (1L to 10L).toSet) // smallest ids kept
  }

  test("syncFromFeed: updates and deletes retire old signatures; the live corpus matches") {
    import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
    val src = new IceTable(spark, newRoot(), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("doc_id"), lit(2))),
      sortOrder = Seq("doc_id")))
    src.insert(history)
    val bands = new IceTable(spark, newRoot(), SigIndex.bandConfig)
    val sigs = new IceTable(spark, newRoot(), SigIndex.sigConfig)
    val marks = new IceTable(spark, newRoot(), SigIndex.marksConfig)
    assert(SigIndex.syncFromFeed(src, bands, sigs, marks, "doc_id", "text")
      === ((3L, 0L)))
    val probe = Seq(
      // near-dup of doc 1's ORIGINAL text
      (100L, "the quick brown fox jumps over the lazy dog near the river shore"),
      // near-dup of doc 2's text
      (101L, "spark executes distributed dataframe queries with catalyst and codegen"))
      .toDF("doc_id", "text")
    def hits = SigIndex.nearDupsAgainstIndex(bands, sigs, probe,
        "doc_id", "text", threshold = 0.5, marks = Some(marks))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((100L, 1L), (101L, 2L)))

    // doc 1 rewritten to unrelated content (CoW update), doc 2 deleted
    // (MoR): both old signatures must retire; the new doc 1 matches a
    // new probe
    src.updateWhere($"doc_id" === 1L,
      Seq("text" -> lit("weather balloons measure stratospheric pressure gradients daily")))
    DeleteVectors.deleteWhere(src, $"doc_id" === 2L)
    Thread.sleep(3)
    val (births, deaths) = SigIndex.syncFromFeed(
      src, bands, sigs, marks, "doc_id", "text")
    assert(births === 1L && deaths === 2L)
    assert(hits === Set.empty) // both old versions retired
    val probe2 = Seq(
      (200L, "weather balloons measure stratospheric pressure gradients hourly"))
      .toDF("doc_id", "text")
    assert(SigIndex.nearDupsAgainstIndex(bands, sigs, probe2,
        "doc_id", "text", threshold = 0.5, marks = Some(marks))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((200L, 1L)))

    // compaction collapses sync duplicates without changing answers
    bands.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    sigs.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    marks.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    assert(hits === Set.empty)

    // idle sync commits nothing
    val logs = Seq(bands, sigs, marks)
      .map(t => t.logio.currentLogFiles(t.root).size)
    assert(SigIndex.syncFromFeed(src, bands, sigs, marks, "doc_id", "text")
      === ((0L, 0L)))
    assert(Seq(bands, sigs, marks)
      .map(t => t.logio.currentLogFiles(t.root).size) === logs)
  }
}
