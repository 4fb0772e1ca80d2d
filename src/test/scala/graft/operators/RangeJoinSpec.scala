package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("windowJoin equals the naive inequality join, pair for pair") {
    // keys 2 users, irregular times incl. exact window-boundary hits
    val left = Seq(
      (1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 90L, "p3"), (2L, 400L, "p4"))
      .toDF("uid", "ts", "tag")
    val right = Seq(
      (1L, 40L, 10L), (1L, 100L, 11L), (1L, 101L, 12L), (1L, 240L, 13L),
      (2L, 29L, 20L), (2L, 30L, 21L), (2L, 90L, 22L), (2L, 401L, 23L))
      .toDF("uid", "ts", "click")

    val got = RangeJoin.windowJoin(left, right,
        Seq("uid"), Seq("uid"), "ts", "ts",
        before = 60L, after = 0L, payload = Seq("click"))
      .select("tag", "matchedTime", "click")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val naive = left.as("l").join(right.as("r"),
        $"l.uid" === $"r.uid" &&
          $"r.ts" >= $"l.ts" - 60L && $"r.ts" <= $"l.ts")
      .select($"l.tag", $"r.ts", $"r.click")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == naive)
    // sanity on the fixture: boundary ts=40 for p1 (100-60) included,
    // ts=29 for p3 (90-61) excluded, after=0 includes simultaneous rows
    assert(naive.contains(("p1", 40L, 10L)))
    assert(naive.contains(("p3", 30L, 21L)) && !naive.exists(_ == ("p3", 29L, 20L)))
    assert(naive.contains(("p1", 100L, 11L)))
  }

  test("windowJoin with before and after both open matches the naive join") {
    val left = (0 until 40).map(i => (i % 3L, i * 13L)).toDF("k", "ts")
    val right = (0 until 60).map(i => (i % 3L, i * 7L + 1, i.toLong))
      .toDF("k", "ts", "v")
    val got = RangeJoin.windowJoin(left, right, Seq("k"), Seq("k"),
        "ts", "ts", before = 20L, after = 15L, payload = Seq("v"))
    val naive = left.as("l").join(right.as("r"),
      $"l.k" === $"r.k" && $"r.ts" >= $"l.ts" - 20L && $"r.ts" <= $"l.ts" + 15L)
    assert(got.count() == naive.count())
    // no duplicate pairs: every (left, right) pair meets in exactly one bucket
    assert(got.count() ==
      got.dropDuplicates("k", "ts", "matchedTime", "v").count())
  }
}
