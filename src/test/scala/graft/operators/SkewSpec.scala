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

  test("key histogram surfaces the hot key") {
    val facts = spark.range(0, 1000)
      .select(when($"id" % 10 === 0, $"id" % 5).otherwise(0L).as("k"))
    val top = Skew.keyHistogram(facts, $"k", 1).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getLong(1) >= 900L)
  }
}
