package graft.streaming

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig, LogMetadata}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once streaming sink: the micro-batch's data files and its
  * (queryName, batchId) record commit in one atomic log PUT, so replays —
  * foreachBatch's at-least-once delivery after crash/restart — are
  * detected from the table's own log fold and skipped. The record must
  * survive every log-rewrite path (merge, optimize, cleanup), or a replay
  * arriving after compaction would duplicate rows.
  */
class StreamCommitSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(dir: String): IceTable =
    new IceTable(spark, tmpDir(dir), IceTableConfig(
      partitionExpr = concat(lit("u="), col("user")),
      sortOrder = Seq("id")))

  private def batch(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"u${i % 3}")).toDF("id", "user")

  test("replayed batch ids are skipped; stale replays too") {
    val table = newTable("sc_replay")
    assert(table.insertBatch(batch(0 until 10), "q1", 0L))
    assert(table.insertBatch(batch(10 until 20), "q1", 1L))
    // crash/restart: foreachBatch re-delivers batch 1
    assert(!table.insertBatch(batch(10 until 20), "q1", 1L))
    // stale replay of an older batch (checkpoint rollback) is also a dup
    assert(!table.insertBatch(batch(0 until 10), "q1", 0L))
    assert(table.read().count() == 20L)
    assert(table.snapshot().streamCommits == Map("q1" -> 1L))
    // a DIFFERENT query name is an independent id space
    assert(table.insertBatch(batch(100 until 105), "q2", 0L))
    assert(table.read().count() == 25L)
    assert(table.snapshot().streamCommits == Map("q1" -> 1L, "q2" -> 0L))
  }

  test("commit records survive merge, optimize, and cleanup log rewrites") {
    val table = newTable("sc_durable")
    (0 until 4).foreach(b =>
      table.insertBatch(batch(b * 10 until (b + 1) * 10), "q", b.toLong))
    table.mergeAll()
    assert(table.snapshot().streamCommits == Map("q" -> 3L),
      "merge carries the per-query max forward")
    assert(!table.insertBatch(batch(30 until 40), "q", 3L),
      "replay after compaction is still detected")

    table.insertBatch(batch(40 until 50), "q", 4L)
    table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(table.snapshot().streamCommits == Map("q" -> 4L))

    // cleanup deletes the merged-away insert logs; the consolidated merged
    // log must still carry the record
    table.tombstoneCleanup(minAgeMs = 0L)
    assert(table.snapshot().streamCommits == Map("q" -> 4L),
      "cleanup consolidation keeps the record after source-log deletion")
    assert(!table.insertBatch(batch(40 until 50), "q", 4L))
    assert(table.read().count() == 50L, "no duplicates across the lifecycle")
  }

  test("iceSinkExactlyOnce end-to-end over MemoryStream") {
    val table = newTable("sc_sink")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Streams.iceSinkExactlyOnce(
      input.toDF().toDF("id", "user"),
      table, tmpDir("sc_ckpt"), queryName = "sink_q",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      mergeEveryBatches = 0)
    try {
      input.addData((1L, "u1"), (2L, "u2"))
      q.processAllAvailable()
      input.addData((3L, "u1"))
      q.processAllAvailable()
    } finally q.stop()
    assert(table.read().count() == 3L)
    val committed = table.snapshot().streamCommits("sink_q")
    // simulate the restart replay of the last delivered batch
    assert(!table.insertBatch(Seq((3L, "u1")).toDF("id", "user"), "sink_q", committed))
    assert(table.read().count() == 3L)
  }

  test("metadata json round-trips the sc field; absent field is unchanged bytes") {
    val m = LogMetadata(1, 1, 2, None, 1700000000000L,
      streamCommits = Map("qb" -> 7L, "qa" -> 12L))
    assert(m.json ==
      """{"v": 1, "sch": 1, "f": 2, "t": 1700000000000, "sc": {"qa": 12, "qb": 7}}""",
      "sc keys serialize sorted (log bytes are deterministic)")
    assert(LogMetadata.fromJson(m.json) == m)
    val legacy = LogMetadata(1, 1, 2, None, 1700000000000L)
    assert(legacy.json == """{"v": 1, "sch": 1, "f": 2, "t": 1700000000000}""",
      "stream-less metadata bytes identical to the reference format")
    assert(LogMetadata.fromJson(legacy.json) == legacy)
  }
}
