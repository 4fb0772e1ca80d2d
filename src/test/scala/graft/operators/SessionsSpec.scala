package graft.operators

import graft.SparkSpec

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap rule, per-user numbering, tie-stable") {
    // user 1: runs {0,10}, {2000,2005}; user 2: one event; gap = 100
    val df = Seq(
      (1L, 0L, 10L), (1L, 10L, 11L), (1L, 2000L, 12L), (1L, 2005L, 13L),
      (2L, 50L, 20L)).toDF("user_id", "ts", "event_id")
    val got = Sessions.sessionize(df, "user_id", "ts", "event_id", gapNs = 100L)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L),
      (1L, 13L, 2L), (2L, 20L, 1L)))
    // stable under repartition (pure function of the data)
    val again = Sessions.sessionize(
      df.repartition(5), "user_id", "ts", "event_id", gapNs = 100L)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("boundary: gap exactly equal to threshold stays in-session") {
    val df = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 201L, 3L))
      .toDF("user_id", "ts", "event_id")
    val seqs = Sessions.sessionize(df, "user_id", "ts", "event_id", 100L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(seqs == Map(1L -> 1L, 2L -> 1L, 3L -> 2L)) // 100 <= gap, 101 > gap
  }

  test("sessionStats rolls up exact spans and counts") {
    val df = Seq((1L, 0L, 1L), (1L, 40L, 2L), (1L, 990L, 3L))
      .toDF("user_id", "ts", "event_id")
    val st = Sessions.sessionStats(df, "user_id", "ts", "event_id", 100L)
      .select("session_seq", "n_events", "start_ns", "end_ns", "span_ns")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(st == Set((1L, 2L, 0L, 40L, 40L), (2L, 1L, 990L, 990L, 0L)))
  }
}
