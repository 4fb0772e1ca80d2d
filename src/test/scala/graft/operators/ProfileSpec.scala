package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes exact per-column stats in one pass") {
    val df = Seq(
      (1L, Some("a"), 1.5),
      (2L, Some("b"), 2.5),
      (3L, None, 4.0),
      (3L, Some("a"), -1.0)
    ).toDF("id", "s", "v")
    val got = Profile.profile(df, exact = true).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5), Option(r.get(6)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got("id") == (4L, 0L, 3L, "1", "3", Some(9.0 / 4)))
    assert(got("s") == (4L, 1L, 2L, "a", "b", None))
    assert(got("v")._4 == "-1.0" && got("v")._5 == "4.0")
    assert(math.abs(got("v")._6.get - 7.0 / 4) < 1e-12)
  }

  test("incrementalDedup drops seen content and intra-batch copies") {
    val seenDocs = Seq((0L, "alpha text"), (1L, "beta text")).toDF("id", "text")
    val newBatch = Seq(
      (10L, "gamma text"),   // fresh
      (11L, "alpha text"),   // replay of seen -> dropped
      (12L, "delta text"),   // fresh
      (13L, "delta text"),   // intra-batch dup -> dropped (13 > 12)
      (14L, "beta text")     // replay of seen -> dropped
    ).toDF("id", "text")
    val kept = Dedup.incrementalDedup(newBatch, Seq("text"), "id",
        Dedup.contentHashes(seenDocs, Seq("text")))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 12L))
  }
}
