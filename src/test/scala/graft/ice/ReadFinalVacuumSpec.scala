package graft.ice

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-7 maintenance surface: merge-on-read FINAL semantics
  * ([[IceTable.readFinal]]), crash-orphan reclaim
  * ([[IceTable.vacuumOrphans]]), and the checkpoint-cadence knob
  * (`checkpointEveryCommits`). */
class ReadFinalVacuumSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, (i % 7).toLong, s"e${i % 3}")).toDF("id", "user_id", "event_type")

  test("readFinal == optimize-then-read for an aggregating table") {
    val cfgAgg = IceTableConfig(
      partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
      sortOrder = Seq("user_id"),
      customInsertSql = Some(
        "select user_id, event_type, cast(count(*) as bigint) as cnt from _rows group by user_id, event_type"),
      customMergeSql = Some(
        "select user_id, event_type, cast(sum(cnt) as bigint) as cnt from source_files group by user_id, event_type"))
    val hot = new IceTable(spark, tmpDir("final_hot"), cfgAgg)
    val cold = new IceTable(spark, tmpDir("final_cold"), cfgAgg)
    Seq(hot, cold).foreach { t =>
      t.insert(batch(0, 500)); t.insert(batch(500, 1000)); t.insert(batch(0, 250))
    }
    cold.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    val finalHot = hot.readFinal().orderBy("user_id", "event_type")
      .collect().toSeq
    val compacted = cold.read().orderBy("user_id", "event_type")
      .select("user_id", "event_type", "cnt").collect().toSeq
    assert(finalHot.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ==
      compacted.map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    // and the raw read still shows the uncollapsed seed rows
    assert(hot.read().count() > hot.readFinal().count())
  }

  test("concurrent readFinal calls with different maxTs never cross views") {
    val cfgAgg = IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("user_id"),
      customInsertSql = Some(
        "select user_id, cast(count(*) as bigint) as cnt from _rows group by user_id"),
      customMergeSql = Some(
        "select user_id, cast(sum(cnt) as bigint) as cnt from source_files group by user_id"))
    val t = new IceTable(spark, tmpDir("final_conc"), cfgAgg)
    t.insert(batch(0, 300))
    Thread.sleep(2); val midTs = System.currentTimeMillis(); Thread.sleep(2)
    t.insert(batch(300, 600))
    val expectEarly = 300L
    val expectLate = 600L
    // per-call unique view names: the old stable-name scheme let thread
    // A's spark.sql analyze against thread B's freshly-replaced view
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val rounds = (1 to 8).map { _ =>
      val fEarly = Future(t.readFinal(midTs).agg(sum("cnt")).head.getLong(0))
      val fLate = Future(t.readFinal().agg(sum("cnt")).head.getLong(0))
      (Await.result(fEarly, 60.seconds), Await.result(fLate, 60.seconds))
    }
    rounds.foreach { case (early, late) =>
      assert(early == expectEarly, s"early readFinal saw $early")
      assert(late == expectLate, s"late readFinal saw $late")
    }
    // and no temp views leak from the read path
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("source_files_final_")))
  }

  test("readFinal is identity without custom merge SQL") {
    val t = new IceTable(spark, tmpDir("final_plain"), IceTableConfig(
      partitionExpr = lit("p=all"), sortOrder = Seq("id")))
    t.insert(batch(0, 100))
    assert(t.readFinal().count() == t.read().count())
  }

  test("vacuumOrphans deletes only unreferenced, expired files") {
    val t = new IceTable(spark, tmpDir("vacuum"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))), sortOrder = Seq("id")))
    t.insert(batch(0, 100))
    val fs = t.logio.fs(t.root)
    // plant an old orphan, a fresh orphan, and a stale _tmp staging dir
    val oldOrphan = new Path(t.root, "_data/p=0/orphan_old.parquet")
    val newOrphan = new Path(t.root, "_data/p=0/orphan_new.parquet")
    Seq(oldOrphan, newOrphan).foreach { p =>
      val out = fs.create(p, false); out.write(1); out.close()
    }
    fs.setTimes(oldOrphan, System.currentTimeMillis() - 7_200_000L, -1)
    val staleTmp = new Path(t.root, "_tmp/stale-job")
    fs.mkdirs(staleTmp)
    fs.setTimes(staleTmp, System.currentTimeMillis() - 7_200_000L, -1)

    val before = t.read().count()
    val deleted = t.vacuumOrphans(minAgeMs = 3_600_000L)
    assert(deleted.exists(_.endsWith("orphan_old.parquet")), s"got $deleted")
    assert(deleted.exists(_.contains("_tmp/")), s"got $deleted")
    assert(!fs.exists(oldOrphan) && !fs.exists(staleTmp))
    assert(fs.exists(newOrphan), "fresh orphan inside the grace window survived")
    // every logged file untouched; answers stable
    assert(t.read().count() == before)
    assert(t.snapshot().aliveFiles.forall(m => fs.exists(new Path(t.root, m.path))))
    // second pass after grace expiry removes the fresh orphan too
    fs.setTimes(newOrphan, System.currentTimeMillis() - 7_200_000L, -1)
    assert(t.vacuumOrphans(3_600_000L).exists(_.endsWith("orphan_new.parquet")))
  }

  test("history() reports per-commit deltas in order") {
    val t = new IceTable(spark, tmpDir("history"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))), sortOrder = Seq("id")))
    t.insert(batch(0, 100))   // 2 files added
    t.insert(batch(100, 200)) // 2 files added
    t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100) // 2 added, 4 tombstoned
    t.removePartitions(parts => parts.filter(_ == "p=0")) // 0 added, 1 tombstoned
    val h = t.history().orderBy("commit_ts", "log_file")
      .select("merged", "files_added", "files_tombstoned")
      .collect().map(r => (r.getBoolean(0), r.getInt(1), r.getInt(2))).toSeq
    assert(h == Seq(
      (false, 2, 0), (false, 2, 0), (true, 2, 4), (true, 0, 1)), s"got $h")
    // bytes added are positive on insert commits and deltas never count a
    // re-listed carried marker as a new add
    val bytes = t.history().orderBy("commit_ts").select("bytes_added")
      .collect().map(_.getLong(0)).toSeq
    assert(bytes.take(3).forall(_ > 0) && bytes.last == 0)
  }

  test("checkpointEveryCommits refreshes the checkpoint on cadence") {
    val t = new IceTable(spark, tmpDir("ckpt_cadence"), IceTableConfig(
      partitionExpr = lit("p=all"), sortOrder = Seq("id"),
      checkpointEveryCommits = Some(3)))
    (0 until 2).foreach(i => t.insert(batch(i * 10, i * 10 + 10)))
    assert(t.logio.listCheckpoints(t.root).isEmpty, "cadence not reached yet")
    t.insert(batch(20, 30))
    val afterThree = t.logio.listCheckpoints(t.root)
    assert(afterThree.nonEmpty, "third commit must checkpoint")
    (0 until 2).foreach(i => t.insert(batch(30 + i * 10, 40 + i * 10)))
    assert(t.logio.listCheckpoints(t.root) == afterThree, "tail of 2 < cadence")
    t.insert(batch(50, 60))
    assert(t.logio.listCheckpoints(t.root) != afterThree, "tail of 3 re-checkpoints")
    // correctness of the seeded read
    assert(t.read().count() == 60)
    assert(t.snapshot().files.map(_.path).toSet ==
      t.logio.readAtMaxTime(t.root, Long.MaxValue, useCheckpoints = false)
        .files.map(_.path).toSet)
  }
}
