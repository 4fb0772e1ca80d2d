package graft.streaming

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The `ice` streaming source tails the table log: replay-from-zero sees
  * every inserted row exactly once, compaction between runs emits nothing
  * (merge logs are excluded), and `startingTimestamp=latest` is pinned in
  * the checkpoint so restarts resume from the original head.
  */
class IceStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(dir: String): IceTable =
    new IceTable(spark, tmpDir(dir), IceTableConfig(
      partitionExpr = concat(lit("u="), col("user")),
      sortOrder = Seq("id")))

  private def rows(ids: Range) =
    ids.map(i => (i.toLong, s"u${i % 3}")).toDF("id", "user")

  /** Drain everything available via foreachBatch (the one sink shape that
    * supports checkpoint recovery in tests); returns the ids THIS run
    * delivered. */
  private def drain(root: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Set[Long] = {
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val reader = spark.readStream.format("ice").option("path", root)
    val q = extra.foldLeft(reader)((r, kv) => r.option(kv._1, kv._2)).load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").as[Long].collect().foreach(got.add); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    import scala.jdk.CollectionConverters._
    got.asScala.toSet
  }

  test("replay from zero, then incremental batches; merges emit nothing") {
    val table = newTable("iss_basic")
    table.insert(rows(0 until 10)); Thread.sleep(3)
    table.insert(rows(10 until 20)); Thread.sleep(3)
    val ckpt = tmpDir("iss_basic_ckpt")

    assert(drain(table.root, ckpt) == (0L until 20L).toSet)

    // compaction rewrites every row into new files — the stream must NOT
    // re-emit them; only genuinely new inserts flow
    table.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    Thread.sleep(3)
    table.insert(rows(20 until 30)); Thread.sleep(3)
    assert(drain(table.root, ckpt) == (20L until 30L).toSet)

    // nothing new: an AvailableNow run delivers zero rows
    assert(drain(table.root, ckpt) == Set.empty[Long])
  }

  test("mid-stream recluster: reader sees no duplicates and no gaps") {
    // the CDC analog of ReclusterSpec's MVCC test: recluster commits one
    // merged (_m) log that rewrites EVERY alive file — including files the
    // reader has not consumed yet. The contract: merged logs emit nothing
    // (no duplicates of already-streamed history) and the yet-unstreamed
    // insert still arrives exactly once from its original non-merged log
    // (no gap), because recluster tombstones but never deletes — deletion
    // is tombstone cleanup's job, which must lag the slowest consumer.
    val table = newTable("iss_recluster")
    val ckpt = tmpDir("iss_recluster_ckpt")
    table.insert(rows(0 until 10)); Thread.sleep(3)
    assert(drain(table.root, ckpt) == (0L until 10L).toSet)

    // insert, then recluster BEFORE the reader catches up
    table.insert(rows(10 until 20)); Thread.sleep(3)
    assert(table.recluster(col("id")) >= 1)
    Thread.sleep(3)
    assert(drain(table.root, ckpt) == (10L until 20L).toSet)

    // the stream keeps flowing normally after the recluster boundary
    table.insert(rows(20 until 30)); Thread.sleep(3)
    assert(drain(table.root, ckpt) == (20L until 30L).toSet)

    // a FRESH reader replaying from zero across the recluster sees every
    // row exactly once too
    assert(drain(table.root, tmpDir("iss_recluster_ckpt2")) ==
      (0L until 30L).toSet)
  }

  test("startingTimestamp=latest skips history and survives restart") {
    val table = newTable("iss_latest")
    table.insert(rows(0 until 15)); Thread.sleep(3)
    val ckpt = tmpDir("iss_latest_ckpt")
    val opts = Map("startingTimestamp" -> "latest")

    // first run: head captured at start, history invisible
    assert(drain(table.root, ckpt, opts) == Set.empty[Long])

    // rows inserted between runs arrive on restart — the captured head is
    // pinned in the checkpoint, not re-read as "now"
    table.insert(rows(15 until 20)); Thread.sleep(3)
    assert(drain(table.root, ckpt, opts) == (15L until 20L).toSet)
  }

  test("schema is pinned: pre-evolution files read later columns as null") {
    val table = newTable("iss_schema")
    table.insert(rows(0 until 5)); Thread.sleep(3)
    table.insert(rows(5 until 10).withColumn("extra", col("id") * 10)); Thread.sleep(3)

    val ckpt = tmpDir("iss_schema_ckpt")
    val q = spark.readStream.format("ice").option("path", table.root).load()
      .writeStream.format("memory").queryName("iss_ssink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val out = spark.table("iss_ssink")
    assert(out.columns.toSet == Set("id", "user", "extra"))
    assert(out.where(col("extra").isNull).count() == 5)
    assert(out.where(col("extra") === col("id") * 10).count() == 5)
  }

  test("batch write: format(ice) save modes against the log") {
    import org.apache.spark.sql.SaveMode
    val root = tmpDir("iss_write")
    def write(mode: SaveMode, ids: Range): Unit =
      rows(ids).write.format("ice").option("path", root)
        .option("partitionExpr", "concat('u=', user)")
        .option("sortOrder", "id")
        .mode(mode).save()
    write(SaveMode.ErrorIfExists, 0 until 10) // empty table: allowed
    write(SaveMode.Append, 10 until 20)
    val back = spark.read.format("ice").option("path", root).load()
    assert(back.select("id").as[Long].collect().toSet == (0L until 20L).toSet)
    assert(back.where(col("u") === "u1").count() ==
      (0 until 20).count(_ % 3 == 1))
    // ErrorIfExists now fails; Ignore no-ops; Overwrite always rejected
    intercept[IllegalStateException] { write(SaveMode.ErrorIfExists, 20 until 30) }
    write(SaveMode.Ignore, 20 until 30)
    assert(spark.read.format("ice").option("path", root).load().count() == 20L)
    intercept[UnsupportedOperationException] { write(SaveMode.Overwrite, 0 until 5) }
  }

  test("batch read: format(ice) load, partition pruning, snapshotTs travel") {
    val table = newTable("iss_batch")
    table.insert(rows(0 until 10)); Thread.sleep(3)
    val between = System.currentTimeMillis(); Thread.sleep(3)
    table.insert(rows(10 until 20))
    table.optimize(maxFileSize = 1L << 30, maxFileCount = 100)

    val df = spark.read.format("ice").option("path", table.root).load()
    // the partition key is a real queryable column; the full row set
    // matches the explicit-file-list read path
    assert(df.columns.contains("u"))
    assert(df.select("id").as[Long].collect().toSet == (0L until 20L).toSet)
    // a partition predicate prunes FILES, not just rows
    val pruned = df.where(col("u") === "u0")
    val scanFileCounts: Seq[Long] =
      pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }
    val prunedFiles = scanFileCounts.sum
    val allFiles = table.snapshot().aliveFiles.length
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles")
    assert(pruned.select("id").as[Long].collect().toSet ==
      (0L until 20L).filter(_ % 3 == 0).toSet)
    // snapshotTs: the strict-< time-travel fold through the reader API
    val tt = spark.read.format("ice").option("path", table.root)
      .option("snapshotTs", between.toString).load()
    assert(tt.select("id").as[Long].collect().toSet == (0L until 10L).toSet)
  }
}
