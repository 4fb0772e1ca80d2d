package graft.streaming

import graft.SparkSpec
import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming change-data feed: `readStream.format("ice").option(
  * "changeFeed", "true")` delivers row-level change batches — inserts,
  * CoW update image pairs, MoR deletes — and stays silent through
  * compaction. */
class ChangeFeedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(tag: String): IceTable = {
    val t = new IceTable(spark, tmpDir(tag), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    t.insert((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t
  }

  /** Drain via foreachBatch; returns (change_type, id, v) triples. */
  private def drain(root: String, ckpt: String): Set[(String, Long, String)] = {
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Long, String)]()
    val q = spark.readStream.format("ice")
      .option("path", root).option("changeFeed", "true").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("_change_type", "id", "v")
          .as[(String, Long, String)].collect().foreach(got.add); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    import scala.jdk.CollectionConverters._
    got.asScala.toSet
  }

  test("change batches carry inserts, update pairs, and MoR deletes; compaction is silent") {
    val t = newTable("cfs_basic")
    val ckpt = tmpDir("cfs_ckpt")

    // initial replay: the seed insert
    assert(drain(t.root, ckpt) ===
      (0 until 10).map(i => ("insert", i.toLong, s"v$i")).toSet)

    // CoW update + MoR delete + a compaction in one window
    t.updateWhere(col("id") === 3L, Seq("v" -> lit("updated")))
    Thread.sleep(3)
    DeleteVectors.deleteWhere(t, col("id") === 7L)
    Thread.sleep(3)
    t.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    Thread.sleep(3)
    assert(drain(t.root, ckpt) === Set(
      ("delete", 3L, "v3"), ("insert", 3L, "updated"),
      ("delete", 7L, "v7")))

    // a maintenance-only window delivers nothing
    DeleteVectors.materialize(t)
    DeleteVectors.vacuum(t)
    Thread.sleep(3)
    assert(drain(t.root, ckpt) === Set.empty[(String, Long, String)])
  }

  test("MonotoneOffset never shrinks and seeds from observed checkpoint offsets") {
    val m = new IceStreamSource.MonotoneOffset
    assert(m(None) === None)
    assert(m(Some(100L)) === Some(100L))
    assert(m(Some(90L)) === Some(100L)) // backwards clock: floor holds
    assert(m(None) === Some(100L)) // a later None never un-serves the floor
    assert(m(Some(110L)) === Some(110L))
    val seeded = new IceStreamSource.MonotoneOffset
    seeded.observe(Some(500L)) // getBatch recovery seed
    assert(seeded(Some(450L)) === Some(500L))
  }

  test("mid-stream tombstone cleanup: default fails loudly, allowHorizonSkip recovers with a gap marker") {
    val t = newTable("cfs_recover")
    val ckpt = tmpDir("cfs_recover_ckpt")
    drain(t.root, ckpt) // consume the seed; checkpoint offset ≈ seed ts

    // history the checkpoint hasn't consumed gets consolidated away
    t.insert((10 until 15).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    Thread.sleep(3)
    t.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    Thread.sleep(3)
    t.tombstoneCleanup(0L)
    Thread.sleep(3)
    t.insert((20 until 23).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    Thread.sleep(3)

    // default: the replayed window starts below the floor → the stream
    // dies loudly instead of silently under-reporting
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t.root, ckpt)
    }
    assert(e.getMessage.contains("consolidated") ||
      Option(e.getCause).exists(_.getMessage.contains("consolidated")))

    // documented recovery: opt in to allowHorizonSkip on the SAME
    // checkpoint — the batch resumes from the floor, post-floor changes
    // arrive, and one in-band gap marker records the skipped span
    val rows = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Option[Long], Long)]()
    val q = spark.readStream.format("ice")
      .option("path", t.root).option("changeFeed", "true")
      .option("allowHorizonSkip", "true").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("_change_type", "id", "_commit_ts").collect().foreach { r =>
          rows.add((r.getString(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
        }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "recovery stream did not drain")
    import scala.jdk.CollectionConverters._
    val got = rows.asScala.toSet
    val floor = graft.ice.ChangeFeed.consolidationFloor(t)
    assert(got.contains(("gap", None, floor)), s"gap marker missing in $got")
    // post-floor inserts arrive exactly; pre-floor history is the gap
    assert(got.collect { case ("insert", Some(id), _) => id } ===
      Set(20L, 21L, 22L))
    // once recovered, the next window is normal — no more gap markers
    DeleteVectors.deleteWhere(t, col("id") === 20L)
    Thread.sleep(3)
    val after = drainSkip(t.root, ckpt)
    assert(after === Set(("delete", 20L, "v20")))
  }

  /** drain() with allowHorizonSkip set (post-recovery windows). */
  private def drainSkip(root: String, ckpt: String): Set[(String, Long, String)] = {
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Long, String)]()
    val q = spark.readStream.format("ice")
      .option("path", root).option("changeFeed", "true")
      .option("allowHorizonSkip", "true").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("_change_type", "id", "v")
          .as[(String, Long, String)].collect().foreach(got.add); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    import scala.jdk.CollectionConverters._
    got.asScala.toSet
  }

  test("a MoR delete alone advances the offset (dv log counts toward the head)") {
    val t = newTable("cfs_dv")
    val ckpt = tmpDir("cfs_dv_ckpt")
    drain(t.root, ckpt) // consume the seed
    DeleteVectors.deleteWhere(t, col("id") === 4L)
    Thread.sleep(3)
    assert(drain(t.root, ckpt) === Set(("delete", 4L, "v4")))
  }
}
