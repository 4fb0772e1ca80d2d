package graft.ice

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Port of log_test.py: append/read round-trip, last-writer-wins fold,
  * strict-`<` time travel, filename codec. Runs on the local FS (the Hadoop
  * FileSystem API is the s3a seam in production). */
class LogIOSpec extends AnyFunSuite {

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("icelog").toString

  private val logio = new IceLogIO("test-host", new Configuration())

  test("append + readAtMaxTime round trip with tombstones") {
    val root = newRoot()
    val schema1 = Schema("a" -> "VARCHAR", "b" -> "BIGINT")
    val m1 = FileMarker("_data/p=1/f1.parquet", 100L, 10L)
    val m2 = FileMarker("_data/p=2/f2.parquet", 101L, 20L)
    val (log1, _) = logio.append(root, 1, schema1, Seq(m1, m2), timestamp = Some(1000L))

    val schema2 = Schema("a" -> "VARCHAR", "b" -> "BIGINT", "c" -> "DOUBLE")
    val m1Tmb = m1.copy(tombstone = Some(2000L))
    val m3 = FileMarker("_data/p=1/f3.parquet", 102L, 30L)
    val (_, _) = logio.append(root, 1, schema2, Seq(m1Tmb, m3),
      tombstones = Seq(LogTombstone(log1, 2000L)), merged = true,
      timestamp = Some(2000L))

    val snap = logio.readAtMaxTime(root, 3000L)
    assert(snap.schema.pairs ==
      Seq("a" -> "VARCHAR", "b" -> "BIGINT", "c" -> "DOUBLE"))
    assert(snap.files.length == 3)
    // last-writer-wins: m1 now carries the tombstone
    val m1Now = snap.files.find(_.path == m1.path).get
    assert(m1Now.tombstone.contains(2000L))
    assert(snap.aliveFiles.map(_.path).sorted ==
      Seq("_data/p=1/f3.parquet", "_data/p=2/f2.parquet"))
    assert(snap.tombstones.map(_.path) == Seq(log1))
    // markers remember their source log for merge's log rewrite
    assert(m1Now.virSourceLogFile.exists(_.contains("2000_m_test-host")))
  }

  test("time travel: strict < on filename timestamp") {
    val root = newRoot()
    logio.append(root, 1, Schema("a" -> "BIGINT"),
      Seq(FileMarker("_data/p/f1.parquet", 1L, 1L)), timestamp = Some(1000L))
    logio.append(root, 1, Schema("a" -> "BIGINT"),
      Seq(FileMarker("_data/p/f2.parquet", 2L, 1L)), timestamp = Some(2000L))

    assert(logio.readAtMaxTime(root, 2000L).files.map(_.path) ==
      Seq("_data/p/f1.parquet")) // strict <: the ts=2000 log is excluded
    assert(logio.readAtMaxTime(root, 2001L).files.length == 2)
    intercept[NoLogFilesException](logio.readAtMaxTime(root, 1000L))
  }

  test("filename codec: {ts}[_m]_{hostname}.jsonl") {
    assert(IceLogIO.logFileInfo("_log/1700000000000_my-host.jsonl") ==
      (1700000000000L, false))
    assert(IceLogIO.logFileInfo("_log/1700000000000_m_my-host.jsonl") ==
      (1700000000000L, true))
    // the reference's own quirk: hostname starting with m_ would parse as
    // merged only via the explicit `_m_` segment, not `m` in the hostname
    assert(IceLogIO.logFileInfo("1700_mhost.jsonl") == (1700L, false))
  }

  test("concurrent-reader safety: partially written logs are never listed") {
    val root = newRoot()
    logio.append(root, 1, Schema("a" -> "BIGINT"), Seq.empty, timestamp = Some(1L))
    // temp artifacts (dot-prefixed) must be invisible
    val fs = logio.fs(root)
    fs.create(new org.apache.hadoop.fs.Path(root, "_log/.tmp.partial.jsonl"), true).close()
    assert(logio.currentLogFiles(root).forall(!_.contains(".tmp.")))
  }

  test("settled bound holds below an in-flight commit until it is visible") {
    val root = newRoot()
    // no in-flight commits: the bound is just the settled clock
    val free = IceLogIO.settledTs(Seq(root))
    assert(free <= System.currentTimeMillis() - 1)
    // a writer fixes its commit ts (the rewrite path's shape) — from this
    // moment until the log file is visible, no settled bound may reach it
    val ts = IceLogIO.registerCommitFloor(root, System.currentTimeMillis())
    Thread.sleep(5) // the clock passes the commit ts while it is in flight
    assert(IceLogIO.settledTs(Seq(root)) === ts - 1) // pinned, not clock-driven
    // a second root is independent
    assert(IceLogIO.settledTs(Seq(newRoot())) >= ts - 1)
    // once visible the bound advances past the commit with the clock
    IceLogIO.endCommit(root, ts)
    Thread.sleep(2)
    assert(IceLogIO.settledTs(Seq(root)) >= ts)
    // duplicate registrations at one ts release one at a time
    IceLogIO.registerCommitFloor(root, ts)
    IceLogIO.registerCommitFloor(root, ts)
    IceLogIO.endCommit(root, ts)
    assert(IceLogIO.settledTs(Seq(root)) === ts - 1)
    IceLogIO.endCommit(root, ts)
    assert(IceLogIO.settledTs(Seq(root)) >= ts)
  }
}
