package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // trades (key, ts) to enrich with the latest quote at-or-before ts
  private lazy val trades = Seq(
    ("A", 10L, 1), ("A", 20L, 2), ("A", 25L, 3),
    ("B", 5L, 4), ("B", 50L, 5),
    ("C", 7L, 6) // no quotes for C at all
  ).toDF("sym", "ts", "trade_id")

  private lazy val quotes = Seq(
    ("A", 10L, 100.0), // tie with trade A@10 — inclusive
    ("A", 15L, 101.0),
    ("A", 30L, 99.0), // after every A trade
    ("B", 1L, 50.0), ("B", 49L, 51.0)
  ).toDF("sym", "qts", "px")

  test("backward as-of picks the latest quote at-or-before, ties inclusive") {
    val out = AsOf.asofJoin(trades, quotes,
        Seq("sym"), Seq("sym"), "ts", "qts", payload = Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Int, Option[Double])].collect()
    assert(out.toSeq == Seq(
      1 -> Some(100.0), // A@10 matches quote A@10 (inclusive tie)
      2 -> Some(101.0), // A@20 -> quote@15
      3 -> Some(101.0), // A@25 -> quote@15 (quote@30 is in the future)
      4 -> Some(50.0),  // B@5 -> quote@1
      5 -> Some(51.0),  // B@50 -> quote@49
      6 -> None))       // C: no quotes, left row kept with null
  }

  test("forward as-of picks the earliest quote at-or-after") {
    val out = AsOf.asofJoin(trades, quotes,
        Seq("sym"), Seq("sym"), "ts", "qts", payload = Seq("px"),
        direction = "forward")
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Int, Option[Double])].collect()
    assert(out.toSeq == Seq(
      1 -> Some(100.0), // A@10 -> quote@10 (inclusive tie beats quote@15)
      2 -> Some(99.0),  // A@20 -> quote@30
      3 -> Some(99.0),
      4 -> Some(51.0),  // B@5 -> quote@49
      5 -> None,        // B@50: no later quote
      6 -> None))
  }

  test("tolerance nulls far matches; inner join drops unmatched") {
    val out = AsOf.asofJoin(trades, quotes,
        Seq("sym"), Seq("sym"), "ts", "qts", payload = Seq("px"),
        tolerance = Some((a, b) => b - a <= lit(6L)),
        joinType = "inner")
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Int, Double)].collect()
    // within 6 ticks: trade1 (10-10=0), trade2 (20-15=5), trade4 (5-1=4),
    // trade5 (50-49=1); trade3 (25-15=10) out of tolerance, C unmatched
    assert(out.toSeq == Seq(1 -> 100.0, 2 -> 101.0, 4 -> 50.0, 5 -> 51.0))
  }

  test("matches a brute-force range-join oracle on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 400).map(i => (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i))
      .toDF("k", "ts", "lid")
    val r = (1 to 300).map(i => (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i * 1.0))
      .toDF("k", "rts", "v")
      // unique (k, rts): the operator's documented precondition for a
      // single defined answer per left row
      .groupBy("k", "rts").agg(max("v").as("v"))

    val got = AsOf.asofJoin(l, r, Seq("k"), Seq("k"), "ts", "rts", Seq("v"))
      .select("lid", "v")

    val expected = l.join(r, l("k") === r("k") && r("rts") <= l("ts"), "left")
      .groupBy(col("lid"))
      .agg(max_by(struct(col("rts"), col("v")), col("rts")).as("m"))
      .select(col("lid"), col("m.v").as("v"))

    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() == 400)
  }

  test("multi-key join keys pair positionally") {
    val l = Seq((1, "x", 10L, "L1"), (1, "y", 10L, "L2")).toDF("a", "b", "ts", "tag")
    val r = Seq((1, "x", 5L, "R1"), (1, "y", 6L, "R2")).toDF("c", "d", "rts", "val")
    val out = AsOf.asofJoin(l, r, Seq("a", "b"), Seq("c", "d"), "ts", "rts", Seq("val"))
      .orderBy("tag").select("tag", "val").as[(String, String)].collect()
    assert(out.toSeq == Seq("L1" -> "R1", "L2" -> "R2"))
  }

  test("plan shape: one shuffle on the key, no row multiplication") {
    val out = AsOf.asofJoin(trades, quotes,
      Seq("sym"), Seq("sym"), "ts", "qts", payload = Seq("px"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // union-merge shape: a Window over the union, never a join operator
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
