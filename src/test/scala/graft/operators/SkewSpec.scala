package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of facts share one hot key
    val facts = spark.range(0, 2000)
      .select((when($"id" % 10 === 0, $"id" % 5).otherwise(0L)).as("k"),
        $"id".as("v"))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "name")

    val plain = facts.join(dim, Seq("k")).groupBy("name").count()
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), buckets = 8)
      .groupBy("name").count()
    assert(salted.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("cosineDupPairs stays bounded on 10^4 identical embeddings") {
    val dim = 8
    // hot group: 10^4 byte-identical vectors — every LSH table maps ALL of
    // them into one bucket. A raw bucket self-join would emit ~5*10^7
    // candidate pairs per table; the capped collect_list shape drops the
    // over-cap bucket outright (documented recall trade on pathological
    // mass-duplication, same contract as the minhash/simhash paths).
    val hotVec = array((0 until dim).map(_ => lit(1.0d)): _*)
    val hot = spark.range(0, 10000)
      .select($"id".as("vec_id"), hotVec.as("embedding"))
    // small group: 50 identical vectors in a different direction — under
    // the cap, so its pairs must all survive
    val smallVec = array((0 until dim).map(i =>
      lit(if (i % 2 == 0) 1.0d else -1.0d)): _*)
    val small = spark.range(20000, 20050)
      .select($"id".as("vec_id"), smallVec.as("embedding"))
    val pairs = Similarity.cosineDupPairs(
      hot.unionByName(small), "vec_id", "embedding",
      threshold = 0.99, dim = dim, maxBucketSize = 1000)
    val got = pairs.select("idA", "idB").as[(Long, Long)].collect()
    // over-cap hot bucket contributes nothing
    assert(!got.exists { case (a, b) => a < 10000 && b < 10000 })
    // the 50-strong under-cap group yields exactly its C(50,2) pairs
    assert(got.count { case (a, b) => a >= 20000 && b >= 20000 } == 1225)
    assert(got.length == 1225)
  }

  test("asofJoin: 10^6-row single-key history completes, linear not quadratic") {
    // every row shares one key: the whole history is ONE window partition
    // (one task), but the work is a sort + one scan — the range-join
    // formulation would attempt 10^6 x 10^5 comparisons here
    val n = 1000000L
    val left = spark.range(n).select(lit(1L).as("k"), ($"id" * 10).as("ts"))
    val right = spark.range(n / 10)
      .select(lit(1L).as("k"), ($"id" * 100).as("rts"), $"id".as("v"))
    val out = AsOf.asofJoin(left, right, Seq("k"), Seq("k"), "ts", "rts", Seq("v"))
    assert(out.count() == n) // left join: every left row survives
    // spot-check the as-of semantics deep in the history:
    // ts=999990 -> latest rts <= ts is 999900 -> v = 9999
    val v = out.where($"ts" === 999990L).select("v").as[Long].head()
    assert(v == 9999L)
  }

  test("windowJoin: 10^6-row hot key spread over time stays bucket-bounded") {
    // single hot key, rows spread over time: the (key, bucket) equi-join
    // bounds per-group work by bucket population (~2x4 here), never by the
    // key's 10^6 rows — the naive key-join residual-filter plan would do
    // 10^12 comparisons in one sort-merge group
    val n = 1000000L
    val left = spark.range(n).select(lit(7L).as("k"), ($"id" * 100).as("ts"))
    val right = spark.range(n)
      .select(lit(7L).as("k"), ($"id" * 100 + 50).as("rts"), $"id".as("v"))
    val out = RangeJoin.windowJoin(left, right, Seq("k"), Seq("k"),
      "ts", "rts", before = 100, after = 100, Seq("v"))
    // left at 100i matches rts 100i+50 and 100i-50; i=0 has only the former
    assert(out.count() == 2 * n - 1)
  }

  test("key histogram surfaces the hot key") {
    val facts = spark.range(0, 1000)
      .select(when($"id" % 10 === 0, $"id" % 5).otherwise(0L).as("k"))
    val top = Skew.keyHistogram(facts, $"k", 1).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getLong(1) >= 900L)
  }
}
