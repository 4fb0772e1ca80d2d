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

  test("dropDuplicatesWithinWatermark drops redelivered keys, bounds state") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val deduped = Streams.dedupWithinWatermark(
      input.toDF().toDF("ts", "key", "v"), Seq("key"), "ts",
      delay = "5 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("wm_dedup").outputMode(OutputMode.Append).start()
    try {
      // k1 delivered twice in one batch, again in the next (a queue
      // redelivery): one surviving row while inside the watermark horizon
      input.addData((ts(0), "k1", 1L), (ts(0, 30), "k1", 2L), (ts(1), "k2", 3L))
      q.processAllAvailable()
      input.addData((ts(2), "k1", 4L))
      q.processAllAvailable()
      val k1 = spark.table("wm_dedup").where($"key" === "k1").count()
      assert(k1 == 1L, s"redelivered k1 must dedup to one row, got $k1")
      // advance the watermark past k1's expiry (first-seen 10:00 + 5min)
      // with an unrelated batch — eviction happens at END of the batch
      // that moves the watermark, so the advance must come BEFORE the
      // re-arrival, not ride along with it
      input.addData((ts(20), "k3", 6L))
      q.processAllAvailable()
      input.addData((ts(21), "k1", 5L)) // state evicted: new data again
      q.processAllAvailable()
      assert(spark.table("wm_dedup").where($"key" === "k1").count() == 2L,
        "a key re-arriving after watermark eviction is new data")
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
