package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time streaming operators over MemoryStream micro-batches. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("watermarked windowed counts aggregate by event time") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = Streams.windowedCounts(
      input.toDF().toDF("ts", "user"), "ts", "user",
      windowDuration = "1 minute", watermark = "5 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode(OutputMode.Update).start()
    try {
      input.addData((ts(0, 10), "u1"), (ts(0, 40), "u1"), (ts(1, 10), "u2"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("user", "cnt").as[(String, Long)].collect().toSet
      assert(rows == Set(("u1", 2L), ("u2", 1L)))
    } finally q.stop()
  }

  test("session windows close on the gap, split on quiet periods") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val sessions = Streams.sessionized(
      input.toDF().toDF("ts", "user"), "ts", "user",
      gap = "2 minutes", watermark = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode(OutputMode.Append).start()
    try {
      // u1: burst at 10:00-10:01, silence, burst at 10:10 → 2 sessions
      input.addData((ts(0), "u1"), (ts(1), "u1"), (ts(10), "u1"))
      q.processAllAvailable()
      // advance the watermark far enough to emit both sessions
      input.addData((ts(30), "u2"))
      q.processAllAvailable()
      input.addData((ts(50), "u2"))
      q.processAllAvailable()
      val u1 = spark.table("sessions").where($"user" === "u1")
        .select("events").as[Long].collect().sorted
      assert(u1.toSeq == Seq(1L, 2L), s"got ${u1.toSeq}")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-key state across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val state = Streams.runningState(input.toDS())
    val q = state.toDF("key", "cnt", "latest").writeStream.format("memory")
      .queryName("running").outputMode(OutputMode.Update).start()
    try {
      input.addData(("a", 5L), ("a", 9L), ("b", 1L))
      q.processAllAvailable()
      input.addData(("a", 7L))
      q.processAllAvailable()
      val last = spark.table("running").groupBy("key")
        .agg(org.apache.spark.sql.functions.max("cnt").as("cnt"),
          org.apache.spark.sql.functions.max("latest").as("latest"))
        .as[(String, Long, Long)].collect()
        .map { case (k, c, l) => k -> ((c, l)) }.toMap
      assert(last("a") == (3L, 9L)) // 3 events seen, max value 9
      assert(last("b") == (1L, 1L))
    } finally q.stop()
  }
}
