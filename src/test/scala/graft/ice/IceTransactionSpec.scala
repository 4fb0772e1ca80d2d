package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Atomic multi-table commits: staged inserts are invisible on every
  * read surface until the single marker PUT, then visible on all tables
  * at once; aborted/crashed stages reclaim. */
class IceTransactionSpec extends SparkSpec {
  import spark.implicits._

  private def pair(): (IceTable, IceTable, String) = {
    val parent = tmpDir("txn_wh")
    val t1 = new IceTable(spark, s"$parent/t1", IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val t2 = new IceTable(spark, s"$parent/t2", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    (t1, t2, parent)
  }

  test("staged inserts are invisible everywhere until ONE marker commits both") {
    val (t1, t2, parent) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    t2.insert(Seq((100L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn"), (3L, "txn")).toDF("id", "v"))
    txn.insert(t2, Seq((200L, "txn")).toDF("id", "v"))
    // pending: no reader surface sees the stage
    assert(t1.read().count() == 1L && t2.read().count() == 1L)
    assert(t1.history().count() == 1L)
    assert(ChangeFeed.between(t1, 0L).count() == 1L)
    // the staged bytes DO exist — visibility is the only thing deferred
    assert(new java.io.File(s"${t1.root}/_log").listFiles()
      .exists(_.getName.contains("_x" + txn.id)))
    txn.commit()
    assert(t1.read().count() == 3L && t2.read().count() == 2L)
    assert(t1.read().where($"v" === "txn").count() == 2L)
    // the marker is one file beside the tables
    assert(new java.io.File(s"$parent/_txn").listFiles().count(
      _.getName == s"${txn.id}.commit") == 1)
    // feeds see the committed rows too
    assert(ChangeFeed.between(t1, 0L).count() == 3L)
  }

  test("abort deletes the staged log and data; nothing was ever visible") {
    val (t1, t2, _) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    txn.insert(t2, Seq((9L, "txn")).toDF("id", "v"))
    txn.abort()
    assert(t1.read().count() == 1L)
    intercept[Exception](txn.commit()) // aborted: cannot commit
    assert(!new java.io.File(s"${t1.root}/_log").listFiles()
      .exists(_.getName.contains("_x")))
    // t2 never had a confirmed commit at all
    assert(t2.trySnapshot(Long.MaxValue).isEmpty)
  }

  test("a crashed (never-committed) stage is invisible and vacuum reclaims it after the TTL") {
    val (t1, _, _) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    // simulate the crash: drop the handle, never commit/abort
    assert(t1.read().count() == 1L)
    // young stage: vacuum must NOT touch it (data protected)
    val young = t1.vacuumOrphans(minAgeMs = 0L)
    assert(!young.exists(_.contains("_x")))
    assert(t1.read().count() == 1L)
    // an expired stage (clock advanced past the TTL) reclaims wholesale
    val future = new IceTable(spark, t1.root, t1.cfg,
      clock = () => System.currentTimeMillis() + 2 * IceTransaction.TtlMs)
    val swept = future.vacuumOrphans(minAgeMs = 0L)
    assert(swept.exists(_.endsWith(".jsonl")) && swept.exists(_.contains("_data/")))
    assert(t1.read().count() == 1L)
    assert(!new java.io.File(s"${t1.root}/_log").listFiles()
      .exists(_.getName.contains("_x")))
  }

  test("a stage survives an interleaved checkpoint: confirmed later, still folded") {
    val (t1, _, _) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    // a normal commit + checkpoint land AFTER the stage's ts
    Thread.sleep(2)
    t1.insert(Seq((3L, "later")).toDF("id", "v"))
    assert(t1.writeCheckpoint().isDefined)
    assert(t1.read().count() == 2L) // checkpoint covers only confirmed logs
    txn.commit()
    // the staged commit's ts precedes the checkpoint, but coverage is a
    // SET, not a threshold: current-minus-covered folds it in
    assert(t1.read().count() == 3L)
    assert(t1.read().where($"v" === "txn").count() == 1L)
  }

  test("a corrupt CONFIRMED tagged log (checkpoint-covered) cannot abort the vacuum") {
    // r14 advice: the protection-set pass used to fetch+parse EVERY
    // txn-tagged log on every sweep — so one rotted historical log
    // (whose files `known` already protects via the fold) permanently
    // aborted all future vacuums, and sweep cost grew with transaction
    // history. Confirmed-at-snapshot logs are now skipped.
    val (t1, _, _) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    txn.commit()
    Thread.sleep(2)
    t1.insert(Seq((3L, "later")).toDF("id", "v"))
    assert(t1.writeCheckpoint().isDefined)
    // rot the historical tagged log's bytes: the fold never reads it
    // (the checkpoint covers it), and neither must the vacuum
    val tagged = new java.io.File(s"${t1.root}/_log").listFiles()
      .filter(f => f.getName.contains("_x" + txn.id) &&
        !f.getName.startsWith("."))
    assert(tagged.length == 1)
    java.nio.file.Files.writeString(tagged.head.toPath, "not json at all")
    val swept = t1.vacuumOrphans(minAgeMs = 0L) // must not throw
    // the transaction's committed data survives (protected via `known`)
    assert(!swept.exists(_.contains("_data/")))
    assert(t1.read().count() == 3L)
    assert(t1.read().where($"v" === "txn").count() == 1L)
  }

  test("no settled feed window closes past an open transaction (in-process)") {
    val (t1, _, _) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    Thread.sleep(3)
    val wm0 = ChangeFeed.settledNow(t1)
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    Thread.sleep(3)
    // while pending, the settled bound stays below the staged ts
    val (feed1, until1) = ChangeFeed.betweenSettled(t1, wm0)
    assert(feed1.count() == 0L)
    txn.commit()
    Thread.sleep(3)
    val (feed2, until2) = ChangeFeed.betweenSettled(t1, until1)
    assert(until2 > until1)
    assert(feed2.where(col("v") === "txn").count() == 1L)
  }

  test("pre-flight failures inside a transaction leave it pending and clean") {
    val (t1, _, _) = pair()
    val parent = new java.io.File(t1.root).getParent
    val tc = new IceTable(spark, s"$parent/t3", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id"),
      checkConstraints = Seq("pos" -> "id > 0")))
    tc.insert(Seq((1L, "a")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    intercept[IllegalArgumentException] {
      txn.insert(tc, Seq((-5L, "bad")).toDF("id", "v"))
    }
    // still pending: a corrected batch stages and commits fine
    txn.insert(tc, Seq((2L, "good")).toDF("id", "v"))
    txn.commit()
    assert(tc.read().count() == 2L)
  }

  test("a vacuum reclaim interleaved between stage and commit yields NONE-visible, never partial") {
    // the clock-skew shape the TTL self-check alone cannot close: the
    // vacuum's clock says the stage is expired while the committer's
    // clock says it is fresh. The abort-intent handshake must make the
    // commit self-abort — all-or-nothing, with the intent marker proving
    // the ordering.
    val (t1, t2, parent) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    t2.insert(Seq((100L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    txn.insert(t2, Seq((200L, "txn")).toDF("id", "v"))
    // a vacuum whose clock is 2×TTL ahead classifies the young stage as
    // expired and reclaims t1's half (t2's table is swept by ITS vacuum,
    // which we deliberately do not run — the asymmetric half-reclaimed
    // state is exactly the dangerous input)
    val skewed = new IceTable(spark, t1.root, t1.cfg,
      clock = () => System.currentTimeMillis() + 2 * IceTransaction.TtlMs)
    val swept = skewed.vacuumOrphans(minAgeMs = 0L)
    assert(swept.exists(_.contains("_x" + txn.id)), "stage log reclaimed")
    // the reclaim left its intent marker beside the would-be commit marker
    assert(new java.io.File(s"$parent/_txn/${txn.id}.abort").exists())
    // commit's own clock says the transaction is young — without the
    // handshake the marker PUT would surface t2's stage WITHOUT t1's
    val ex = intercept[IllegalStateException](txn.commit())
    assert(ex.getMessage.contains("reclaimed"))
    // NONE visible: both tables still read their seeds only, and the
    // commit marker was withdrawn
    assert(t1.read().count() == 1L && t2.read().count() == 1L)
    assert(!new java.io.File(s"$parent/_txn/${txn.id}.commit").exists())
    // the failed commit released its settled-floor pins: feed windows
    // for both tables advance past the staged ts instead of wedging
    Thread.sleep(3)
    assert(ChangeFeed.settledNow(t1) > System.currentTimeMillis() - 1000L)
    // and a retry transaction works
    val retry = IceTransaction.begin(spark)
    retry.insert(t1, Seq((3L, "retry")).toDF("id", "v"))
    retry.insert(t2, Seq((300L, "retry")).toDF("id", "v"))
    retry.commit()
    assert(t1.read().count() == 2L && t2.read().count() == 2L)
  }

  test("a late-confirming transaction beats a racing vacuum: reclaim skipped, intent withdrawn") {
    val (t1, _, parent) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    txn.commit() // marker lands FIRST
    // a skewed vacuum now classifies the (confirmed) stage — it must see
    // the commit marker on its post-intent probe and keep everything.
    // txnConfirmed's positive cache makes stagedLogFiles skip it outright;
    // either path ends with the stage intact and no lingering intent.
    val skewed = new IceTable(spark, t1.root, t1.cfg,
      clock = () => System.currentTimeMillis() + 2 * IceTransaction.TtlMs)
    val swept = skewed.vacuumOrphans(minAgeMs = 0L)
    assert(!swept.exists(_.contains("_x" + txn.id)))
    assert(t1.read().count() == 2L)
    assert(!new java.io.File(s"$parent/_txn/${txn.id}.abort").exists())
  }

  test("an ABANDONED transaction's settled-floor pins auto-expire at its TTL") {
    val (t1, _, _) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    Thread.sleep(3)
    val wm0 = ChangeFeed.settledNow(t1)
    val txn = IceTransaction.beginWithTtl(spark, ttlMs = 150L)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    Thread.sleep(3)
    // while young, the pin holds: no window closes past the staged ts
    assert(ChangeFeed.betweenSettled(t1, wm0)._1.count() == 0L)
    // abandon it (no commit, no abort). Past the TTL the pin lapses and
    // settled bounds flow again — the staged rows stay invisible (no
    // marker), so nothing is lost, and commit() refuses from now on.
    Thread.sleep(200L)
    val (_, until1) = ChangeFeed.betweenSettled(t1, wm0)
    assert(until1 > wm0)
    intercept[IllegalStateException](txn.commit())
  }

  test("a TTL lapse DURING the marker PUT un-commits (late marker never lands below the watermark)") {
    // the entry TTL gate passes, then a GC pause / slow store parks the
    // commit until the floor deadline has lapsed — by which time the
    // settled-floor pins are released and a feed window may have closed
    // past the staged ts. The post-PUT re-check must withdraw the marker
    // and abort: a skewed/paused commit can die, never land late.
    val (t1, _, parent) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val t0 = System.currentTimeMillis()
    val ttl = 3500L
    val txn = IceTransaction.beginWithTtl(spark, ttlMs = ttl,
      afterMarkerPut = () => {
        val wait = t0 + ttl + 300L - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
      })
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    val ex = intercept[IllegalStateException](txn.commit())
    // the post-PUT check is the one under test; on a host slow enough
    // that the insert alone ate the TTL, the entry gate fires instead —
    // either way the invariant holds: aborted, nothing visible
    assert(ex.getMessage.contains("TTL lapsed during the marker PUT") ||
      ex.getMessage.contains("exceeded its"))
    assert(t1.read().count() == 1L)
    val txnDir = new java.io.File(s"$parent/_txn")
    assert(!txnDir.exists() ||
      !txnDir.listFiles().exists(_.getName == s"${txn.id}.commit"))
    // the floor pins released with the abort: settled bounds flow again
    assert(graft.ice.ChangeFeed.settledNow(t1) > 0L)
  }

  test("late-confirmed expired stage: reclaim skipped AND the orphan sweep spares its committed data") {
    // the race: the vacuum reads the snapshot (building `known`) while
    // the stage is unconfirmed, the commit marker lands, then the
    // handshake probe honors it and skips the reclaim — but the stage's
    // data files are in neither `known` nor the live-stage protection
    // set and are older than the skewed cutoff. The sweep must protect
    // them: they are COMMITTED data now.
    val (t1, _, parent) = pair()
    t1.insert(Seq((1L, "seed")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "txn")).toDF("id", "v"))
    val marker = new java.io.File(s"$parent/_txn/${txn.id}.commit")
    val skewed = new IceTable(spark, t1.root, t1.cfg,
      clock = () => System.currentTimeMillis() + 2 * IceTransaction.TtlMs)
    val swept = skewed.vacuumOrphansImpl(0L, () => {
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath, "{}".getBytes("UTF-8"))
      ()
    })
    // nothing of the stage was touched — not the log, not the data —
    // and the now-confirmed commit reads back whole
    assert(!swept.exists(_.contains("_x" + txn.id)))
    assert(t1.read().count() == 2L)
    assert(t1.read().where($"v" === "txn").count() == 1L)
  }

  test("tables in different parent directories are rejected") {
    val (t1, _, _) = pair()
    val (t2other, _, _) = pair() // different parent
    t1.insert(Seq((1L, "a")).toDF("id", "v"))
    val txn = IceTransaction.begin(spark)
    txn.insert(t1, Seq((2L, "b")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      txn.insert(t2other, Seq((3L, "c")).toDF("id", "v"))
    }
    txn.abort()
  }
}
