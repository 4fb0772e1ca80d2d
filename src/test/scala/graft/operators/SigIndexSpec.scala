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
}
