package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.TimeLimits
import org.scalatest.concurrent.Signaler
import org.scalatest.time.{Seconds, Span}

/** Regression for the round-2 thread-pool starvation deadlock: cleanup used
  * to run `readLogForward` (which Awaits on IceLogIO.ioPool) inside futures
  * submitted to that same fixed 16-thread pool, so with more than 16 merged
  * logs every pool thread blocked on inner work that could never run. The
  * lifecycle suite never crossed 16 merged logs, so this spec does —
  * cleanup over 40 merged logs must complete and collapse them to one
  * (the reference's log-truncation invariant, integration_test.py:401-426).
  */
class CleanupScaleSpec extends SparkSpec with TimeLimits {
  private implicit val signaler: Signaler =
    org.scalatest.concurrent.ThreadSignaler

  test("concurrent appends never collide on the same-ms log filename") {
    val root = tmpDir("concurrent_log")
    val cfg = IceTableConfig(partitionExpr = lit("p=1"), sortOrder = Seq.empty)
    val logio = new IceTable(spark, root, cfg).logio
    val schema = Schema("ts" -> "BIGINT")
    val fixedTs = 1690000000000L // every thread requests the SAME commit ms
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val rels = Await.result(
      Future.traverse((0 until 24).toList)(i => Future {
        logio.append(root, 1, schema,
          Seq(FileMarker(s"_data/p=1/c$i.parquet", fixedTs, 10L)),
          timestamp = Some(fixedTs))._1
      }), 60.seconds)
    assert(rels.distinct.length == 24, "colliding log filenames")
    assert(logio.currentLogFiles(root).length == 24)
    // all 24 markers fold in — nothing was overwritten
    val (_, markers, _) = logio.readLogForward(root, rels)
    assert(markers.length == 24)
  }

  test("tombstoneCleanup over 40 merged logs completes (no ioPool deadlock)") {
    val root = tmpDir("cleanup_scale")
    val cfg = IceTableConfig(partitionExpr = lit("p=1"), sortOrder = Seq.empty)
    val table = new IceTable(spark, root, cfg)
    val logio = table.logio
    val schema = Schema("ts" -> "BIGINT")
    val base = 1700000000000L
    (0 until 40).foreach { i =>
      logio.append(root, 1, schema,
        Seq(FileMarker(s"_data/p=1/f$i.parquet", base + i, 100L)),
        merged = true, timestamp = Some(base + i))
    }

    val result = failAfter(Span(120, Seconds)) {
      table.tombstoneCleanup(minAgeMs = 365L * 24 * 3600 * 1000)
    }
    assert(result.cleanedLogFiles.length == 40)
    assert(result.deletedLogFiles.isEmpty)
    assert(result.deletedDataFiles.isEmpty)
    val snap = table.snapshot()
    assert(snap.logFiles.length == 1)
    assert(snap.aliveFiles.length == 40)
  }

  test("tombstoneCleanup at 10⁵ markers stays near-linear (no O(files²) fold)") {
    // Regression: the per-marker tombstone fallback used to linear-scan the
    // whole snapshot (snap.files.find) — 10¹⁰ comparisons at this scale,
    // minutes of driver CPU. With the prebuilt path→tombstone index the
    // whole cleanup (fold + 50k optimistic deletes + consolidated append)
    // fits comfortably in the time box.
    val root = tmpDir("cleanup_wide")
    val cfg = IceTableConfig(partitionExpr = lit("p=1"), sortOrder = Seq.empty)
    val table = new IceTable(spark, root, cfg)
    val logio = table.logio
    val schema = Schema("ts" -> "BIGINT")
    val base = 1700000000000L
    (0 until 500).foreach { i =>
      val dead = (0 until 100).map(j =>
        FileMarker(s"_data/p=1/dead${i}_$j.parquet", base, 100L, Some(base)))
      val live = (0 until 100).map(j =>
        FileMarker(s"_data/p=1/live${i}_$j.parquet", base, 100L))
      logio.append(root, 1, schema, dead ++ live,
        merged = true, timestamp = Some(base + i))
    }
    val result = failAfter(Span(120, Seconds)) {
      table.tombstoneCleanup(minAgeMs = 0L)
    }
    assert(result.cleanedLogFiles.length == 500)
    assert(result.deletedDataFiles.length == 50000)
    val snap = table.snapshot()
    assert(snap.logFiles.length == 1)
    assert(snap.aliveFiles.length == 50000)
  }
}
