package graft.streaming

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A21: the reference's interval batcher (examples/api-flask.py:51-141 —
  * in-memory buffer flushed on a timer) maps to Structured Streaming
  * `foreachBatch`: each micro-batch is one atomic ice insert (one log
  * append), and maintenance (merge/cleanup) runs between batches exactly
  * like the reference's timer threads.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("readStream → foreachBatch(ice.insert) → snapshot") {
    val table = new IceTable(spark, tmpDir("stream"),
      IceTableConfig(
        partitionExpr = concat(lit("u="), col("user_id")),
        sortOrder = Seq("ts")))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("ts", "event", "user_id")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) { table.insert(batch); () }
      }
      .start()
    try {
      input.addData((1L, "a", "u1"), (2L, "b", "u2"))
      q.processAllAvailable()
      input.addData((3L, "c", "u1"))
      q.processAllAvailable()
    } finally q.stop()

    val snap = table.snapshot()
    assert(snap.logFiles.length == 2) // one atomic commit per micro-batch
    assert(table.read().count() == 3)
    table.mergeAll()
    assert(table.read().count() == 3)
  }

  test("streaming MV double-write: mv sum(cnt) == raw count across batches") {
    val rawTable = new IceTable(spark, tmpDir("smv_raw"),
      IceTableConfig(
        partitionExpr = concat(lit("u="), col("user_id")),
        sortOrder = Seq("ts")))
    val mvTable = new IceTable(spark, tmpDir("smv_agg"),
      IceTableConfig(
        partitionExpr = concat(lit("e="), col("event")),
        sortOrder = Seq("user_id"),
        customInsertSql = Some(
          "select user_id, event, cast(count(*) as bigint) as cnt " +
            "from _rows group by user_id, event"),
        customMergeSql = Some(
          "select user_id, event, cast(sum(cnt) as bigint) as cnt " +
            "from source_files group by user_id, event")))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = Streams.mvSink(
      input.toDF().toDF("ts", "event", "user_id"),
      rawTable, mvTable, tmpDir("smv_ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      mergeEveryBatches = 0)
    try {
      input.addData((1L, "a", "u1"), (2L, "b", "u2"), (3L, "a", "u1"))
      q.processAllAvailable()
      input.addData((4L, "a", "u2"), (5L, "b", "u1"))
      q.processAllAvailable()
    } finally q.stop()

    def mvSum(): Long =
      mvTable.read().agg(sum($"cnt")).collect()(0).getLong(0)
    assert(rawTable.read().count() == 5L)
    assert(mvSum() == 5L)
    rawTable.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    mvTable.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(rawTable.read().count() == 5L)
    assert(mvSum() == 5L)
  }
}
