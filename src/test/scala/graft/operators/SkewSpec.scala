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

  test("key histogram surfaces the hot key") {
    val facts = spark.range(0, 1000)
      .select(when($"id" % 10 === 0, $"id" % 5).otherwise(0L).as("k"))
    val top = Skew.keyHistogram(facts, $"k", 1).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getLong(1) >= 900L)
  }
}
