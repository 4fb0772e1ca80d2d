package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"document body number $i with words")).toDF("id", "text")

  test("bloom dedup == exact dedup; miss path skips verification") {
    val history = docs(0, 2000)
    val bits = BloomDedup.build(history, Seq("text"), expectedItems = 4000)
    // batch: 500 new docs + 20 redeliveries of history + 2 intra-batch dups
    val fresh = docs(2000, 2500)
    val redelivered = docs(100, 120).select(($"id" + 50000).as("id"), $"text")
    val intraDup = docs(2000, 2002).select(($"id" + 60000).as("id"), $"text")
    val batch = fresh.unionByName(redelivered).unionByName(intraDup)

    val kept = BloomDedup.dedupAgainst(batch, Seq("text"), "id", bits,
      BloomDedup.hashes64(history, Seq("text")))
    // exact semantics: the 500 fresh docs survive with their min-id rep
    assert(kept.count() == 500)
    assert(kept.agg(sum("id")).head.getLong(0) ==
      (2000L until 2500L).sum)

    // the bloom genuinely prunes: hits ≈ 20 history dups + ~1% fp ≪ batch
    // size (the 2 intra-batch dups copy FRESH docs — correctly a miss)
    val hits = batch.where(BloomDedup.mightContain(bits, Seq("text"))).count()
    assert(hits >= 20, s"true dups must hit, got $hits")
    assert(hits < 100, s"fp blowup: $hits hits of ${batch.count()}")
  }

  test("never drops a new doc (false positives verified away)") {
    // tiny, deliberately overloaded filter → high fpp; exactness must hold
    val history = docs(0, 1000)
    val bits = BloomDedup.build(history, Seq("text"), expectedItems = 50, fpp = 0.2)
    val batch = docs(1000, 1400)
    val kept = BloomDedup.dedupAgainst(batch, Seq("text"), "id", bits,
      BloomDedup.hashes64(history, Seq("text")))
    assert(kept.count() == 400) // every new doc survives despite many FPs
  }

  test("merge composes incremental builds") {
    val a = BloomDedup.build(docs(0, 500), Seq("text"), expectedItems = 2000)
    val b = BloomDedup.build(docs(500, 1000), Seq("text"), expectedItems = 2000)
    val merged = BloomDedup.merge(a, b)
    val hits = docs(0, 1000).where(
      BloomDedup.mightContain(merged, Seq("text"))).count()
    assert(hits == 1000, s"merged filter must contain both halves, got $hits")
    val kept = BloomDedup.dedupAgainst(docs(900, 1100), Seq("text"), "id",
      merged, BloomDedup.hashes64(docs(0, 1000), Seq("text")))
    assert(kept.count() == 100)
  }
}
