package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring span dedup: repeated token spans are removed from every
  * occurrence except the globally first; unique prose is untouched. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(id: Int, n: Int): String =
    (0 until n).map(i => s"u${id}x$i").mkString(" ")

  test("cross-doc planted span survives only in the first document") {
    val span = (0 until 10).map(i => s"zzspan$i").mkString(" ")
    val docs = (0 until 5)
      .map(i => (i.toLong, s"${uniq(i, 12)} $span ${uniq(i + 100, 7)}"))
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()

    // doc 0: everything kept (12 + 10 + 7 tokens)
    assert(out(0)._3 == 29L && out(0)._4 == 0L)
    assert(out(0)._2.contains(span))
    // docs 1-4: exactly the 10 planted tokens removed, prose intact
    out.drop(1).foreach { case (id, clean, kept, removed) =>
      assert(removed == 10L, s"doc $id removed $removed")
      assert(kept == 19L)
      assert(!clean.contains("zzspan"))
      assert(clean == s"${uniq(id.toInt, 12)} ${uniq(id.toInt + 100, 7)}")
    }
  }

  test("within-doc repetition: second occurrence removed, first kept") {
    val span = (0 until 9).map(i => s"rep$i").mkString(" ")
    val doc = Seq((1L, s"$span ${uniq(1, 5)} $span")).toDF("doc_id", "text")
    val Array((_, clean, kept, removed)) =
      SpanDedup.dedupSpans(doc, "doc_id", "text", n = 8)
        .as[(Long, String, Long, Long)].collect()
    assert(removed == 9L && kept == 14L)
    assert(clean == s"$span ${uniq(1, 5)}")
  }

  test("duplicate-free corpus passes through unchanged (normalized)") {
    val docs = (0 until 20).map(i => (i.toLong, uniq(i, 30))).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 8)
    assert(out.where($"removed_tokens" =!= 0L).count() == 0)
    val mismatched = out.join(docs, "doc_id")
      .where($"clean_text" =!= lower($"text")).count()
    assert(mismatched == 0)
  }

  test("short and empty docs survive with zero counts") {
    val docs = Seq((1L, "only three tokens"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "only three tokens", 3L, 0L)))
    assert(out(1) == ((2L, "", 0L, 0L)))
    assert(out(2) == ((3L, "", 0L, 0L)))
  }

  test("hot span in 10k docs: one canonical survivor, bounded run") {
    val span = (0 until 8).map(i => s"hot$i").mkString(" ")
    val docs = spark.range(10000)
      .select($"id".as("doc_id"),
        concat(lit(span + " "),
          concat_ws(" ", (0 until 4).map(j =>
            concat(lit(s"w$j"), $"id")): _*)).as("text"))
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 8).cache()
    assert(out.where($"removed_tokens" === 8L).count() == 9999)
    assert(out.where($"removed_tokens" === 0L).count() == 1)
    assert(out.where($"doc_id" === 0L).head().getString(1).startsWith(span))
    out.unpersist()
  }
}
