package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot checkpoints ([[IceLogIO.writeCheckpoint]]): the fold seeded
  * from a checkpoint + tail logs must be indistinguishable from the raw
  * fold of the whole log, across every lifecycle mutation — insert, merge,
  * tombstone cleanup (which DELETES covered logs), time travel, and a
  * follow-up merge executed from a checkpoint-seeded snapshot (exercising
  * the preserved `vsl` source-log linkage).
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String): IceTable =
    new IceTable(spark, tmpDir(name), IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  private def stateKey(s: IceSnapshot): (Set[(String, Option[Long])], Set[String], String) =
    (s.files.map(m => (m.path, m.tombstone)).toSet,
      s.tombstones.map(_.path).toSet,
      s.schema.toJson)

  test("checkpoint-seeded fold == raw fold across insert/merge/cleanup") {
    val t = mkTable("ckpt_fold")
    t.insert(batch(0, 100)); t.insert(batch(100, 200))
    Thread.sleep(2) // commits strictly precede the checkpoint's fold ts
    assert(t.writeCheckpoint().isDefined)
    // same state again → idempotent skip
    assert(t.writeCheckpoint().isEmpty)

    t.insert(batch(200, 300))
    t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    t.insert(batch(300, 400))

    val withCkpt = t.snapshot()
    val raw = t.logio.readAtMaxTime(t.root, withCkpt.timestamp, useCheckpoints = false)
    assert(stateKey(withCkpt) == stateKey(raw))
    assert(t.read().count() == 400)

    // cleanup deletes covered logs and auto-refreshes the checkpoint
    val chkBefore = t.logio.listCheckpoints(t.root)
    t.tombstoneCleanup(0)
    val chkAfter = t.logio.listCheckpoints(t.root)
    assert(chkAfter.nonEmpty && chkAfter != chkBefore)
    val postClean = t.snapshot()
    val postRaw = t.logio.readAtMaxTime(t.root, postClean.timestamp, useCheckpoints = false)
    assert(stateKey(postClean) == stateKey(postRaw))
    assert(t.read().count() == 400)
    // the refreshed checkpoint is canonical: no markers for deleted files
    val latest = t.logio.latestCheckpointBefore(t.root, Long.MaxValue).get
    assert(latest.markers.map(m => (m.path, m.tombstone)).toSet ==
      postRaw.files.map(m => (m.path, m.tombstone)).toSet)
  }

  test("snapshot tail fetches only uncovered logs") {
    val t = mkTable("ckpt_tail")
    (0 until 10).foreach(i => t.insert(batch(i * 10, i * 10 + 10)))
    Thread.sleep(2)
    t.writeCheckpoint()
    t.insert(batch(100, 110))
    val snap = t.snapshot()
    assert(snap.logFiles.length == 11) // listing still sees every log
    // fold correctness with a tail of exactly one
    val raw = t.logio.readAtMaxTime(t.root, snap.timestamp, useCheckpoints = false)
    assert(stateKey(snap) == stateKey(raw))
    assert(t.read().count() == 110)
  }

  test("time travel to before the checkpoint ignores it") {
    val t = mkTable("ckpt_tt")
    t.insert(batch(0, 50))
    Thread.sleep(2)
    val midTs = System.currentTimeMillis()
    Thread.sleep(2)
    t.insert(batch(50, 100))
    Thread.sleep(2)
    t.writeCheckpoint()
    // ckptTs >= midTs → checkpoint ineligible; raw fold of the first log
    assert(t.read(midTs).count() == 50)
    assert(t.read().count() == 100)
  }

  test("merge from a checkpoint-seeded snapshot rewrites the right source logs") {
    val t = mkTable("ckpt_merge")
    t.insert(batch(0, 100)); t.insert(batch(100, 200))
    Thread.sleep(2)
    t.writeCheckpoint()
    // drop the in-JVM nothing; snapshot now seeds from the checkpoint and
    // merge must still resolve each marker's source log (vsl round-trip)
    val merges = t.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(merges > 0)
    assert(t.read().count() == 200)
    val snap = t.snapshot()
    assert(snap.aliveFiles.length == 4) // one per partition after full merge
    // every alive file re-listed by the merge logs, none orphaned
    val raw = t.logio.readAtMaxTime(t.root, snap.timestamp, useCheckpoints = false)
    assert(stateKey(snap) == stateKey(raw))
  }

  test("checkpoint pruning keeps the newest K") {
    val t = mkTable("ckpt_prune")
    (0 until 5).foreach { i =>
      t.insert(batch(i * 10, i * 10 + 10))
      Thread.sleep(2)
      t.writeCheckpoint(keep = 2)
    }
    val chk = t.logio.listCheckpoints(t.root)
    assert(chk.length == 2)
    assert(stateKey(t.snapshot()) ==
      stateKey(t.logio.readAtMaxTime(t.root, Long.MaxValue, useCheckpoints = false)))
  }

  test("marker vsl field round-trips through checkpoint bytes only") {
    val m = FileMarker("_data/p=0/x.parquet", 10L, 5L,
      virSourceLogFile = Some("_log/123_h.jsonl"))
    assert(m.json.contains("\"vsl\""))
    assert(FileMarker.fromJson(m.json) == m)
    // normal log appends strip vsl → reference byte format untouched
    val stripped = m.copy(virSourceLogFile = None)
    assert(!stripped.json.contains("vsl"))
    assert(stripped.json == """{"p": "_data/p=0/x.parquet", "b": 5, "t": 10}""")
  }
}
