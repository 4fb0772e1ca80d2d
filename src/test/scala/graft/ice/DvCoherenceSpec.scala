package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 deletion-vector coherence: after a merge-on-read delete, EVERY
  * first-class read surface returns the same answer with no materialize —
  * `IceTable.read`, the `graft.` SQL catalog, `format("ice")`, temp views,
  * and the pruned read helpers. Plus the commit-time staleness gates: a dv
  * commit landing between a rewrite's data read and its commit aborts the
  * rewrite, and a dv rewrite never drops marks committed after its
  * snapshot (the vacuum race). */
class DvCoherenceSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  private def mkTable(name: String): IceTable =
    new IceTable(spark, tmpDir(name), IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))

  test("all read surfaces agree after deleteWhere, without materialize") {
    val t = mkTable("dvc_surfaces")
    t.insert(batch(0, 400)); t.insert(batch(400, 800))
    DeleteVectors.deleteWhere(t, col("id") % 10 === 3)
    val expect = (0L until 800L).filterNot(_ % 10 == 3)

    // 1. native read
    assert(t.read().count() == expect.length)
    assert(t.read().agg(sum("id")).head.getLong(0) == expect.sum)
    // 2. DeleteVectors.read (alias)
    assert(DeleteVectors.read(t).count() == expect.length)
    // 3. catalog-grade DataFrame + temp view
    val df = graft.plans.IceFileIndex.dataFrame(spark, t)
    assert(df.count() == expect.length)
    graft.plans.IceFileIndex.registerView(spark, t, "dvc_view")
    assert(spark.sql("SELECT sum(id) s FROM dvc_view").head.getLong(0) == expect.sum)
    // 4. SQL catalog (graft.<name>)
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    assert(spark.sql(s"SELECT count(*) c FROM graft.`${f.getName}`")
      .head.getLong(0) == expect.length)
    assert(spark.sql(s"SELECT sum(id) s FROM graft.`${f.getName}`")
      .head.getLong(0) == expect.sum)
    // 5. format("ice") batch relation (IceDvOverlay rule)
    val viaFormat = spark.read.format("ice").option("path", t.root).load()
    assert(viaFormat.count() == expect.length)
    assert(viaFormat.agg(sum("id")).head.getLong(0) == expect.sum)
    // partition pruning still composes with the overlay
    assert(viaFormat.where(col("p") === "1").count() ==
      expect.count(_ % 4 == 1))
    // 6. pruned read helpers
    assert(t.readPartitions(Set("p=1")).count() == expect.count(_ % 4 == 1))
    assert(t.readPartitionRange("p=0", "p=1").count() ==
      expect.count(i => i % 4 == 0 || i % 4 == 1))
    // readFinal on a no-merge-SQL table = read
    assert(t.readFinal().count() == expect.length)
  }

  test("time travel pins the dv snapshot on every surface") {
    val t = mkTable("dvc_tt")
    t.insert(batch(0, 100))
    Thread.sleep(2); val preTs = System.currentTimeMillis(); Thread.sleep(2)
    DeleteVectors.deleteWhere(t, col("id") < 10)
    assert(t.read().count() == 90)
    assert(t.read(preTs).count() == 100)
    val dfBefore = graft.plans.IceFileIndex.dataFrame(spark, t, preTs)
    assert(dfBefore.count() == 100)
    assert(graft.plans.IceFileIndex.dataFrame(spark, t).count() == 90)
  }

  test("no-dv tables keep a join-free plan through the catalog path") {
    val t = mkTable("dvc_plain")
    t.insert(batch(0, 100))
    val plan = graft.plans.IceFileIndex.dataFrame(spark, t)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in no-dv plan:\n$plan")
    val planF = spark.read.format("ice").option("path", t.root).load()
      .queryExecution.optimizedPlan.toString
    assert(!planF.contains("Join"), s"unexpected join in format plan:\n$planF")
  }

  test("rewrite commit aborts when a dv commit lands after its data read") {
    val t = mkTable("dvc_stale")
    t.insert(batch(0, 100))
    val stamp = t.dvStamp() // what a rewrite would capture before reading
    DeleteVectors.deleteWhere(t, col("id") === 5L) // lands "mid-rewrite"
    val snap = t.snapshot()
    intercept[CommitConflictException] {
      t.validatedRewriteCommit(snap.aliveFiles, Seq.empty,
        dvStampAtRead = stamp)
    }
    // and the table is untouched by the aborted commit
    assert(t.read().count() == 99)
  }

  test("maintenance retries through concurrent dv commits (stamp gate end-to-end)") {
    val t = mkTable("dvc_retry")
    t.insert(batch(0, 200)); t.insert(batch(200, 400))
    DeleteVectors.deleteWhere(t, col("id") % 7 === 0)
    // optimize re-captures a fresh stamp per round, so with no concurrent
    // writer it must succeed while still applying the marks
    t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(t.read().count() == 400 - (0 until 400).count(_ % 7 == 0))
  }

  test("RACING deleteWhere vs optimize: every committed delete stays deleted") {
    val t = mkTable("dvc_race")
    t.insert(batch(0, 400)); t.insert(batch(400, 800))
    val deleted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val deleter = new Thread(() => {
      try {
        var i = 0L
        while (i < 30) {
          if (DeleteVectors.deleteWhere(t, col("id") === i * 7) == 1) deleted.add(i * 7)
          i += 1
        }
      } catch { case e: Throwable => errors.add(e) } finally stop.set(true)
    }, "dvc-deleter")
    val optimizer = new Thread(() => {
      try {
        while (!stop.get()) {
          try t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
          catch { case _: CommitConflictException => () } // retry next round
          Thread.sleep(1)
        }
      } catch { case e: Throwable => errors.add(e) }
    }, "dvc-optimizer")
    deleter.start(); optimizer.start()
    deleter.join(120000); optimizer.join(120000)
    assert(errors.isEmpty, s"background failure: ${errors.peek()}")
    // the stamp gate's guarantee: a delete whose commit SUCCEEDED is never
    // resurrected by a concurrently-committed compaction
    import scala.jdk.CollectionConverters._
    val del = deleted.asScala.toSet
    val remaining = t.read().select("id").collect().map(_.getLong(0)).toSet
    val resurrected = del intersect remaining
    assert(resurrected.isEmpty, s"resurrected rows: $resurrected")
    assert(remaining.size == 800 - del.size)
    // and a final optimize converges to the same answer
    t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(t.read().count() == 800 - del.size)
  }

  test("RACING deleteWhere vs CoW updateWhere: deletes stay deleted, updates apply") {
    val t = mkTable("dvc_race_dml")
    t.insert(batch(0, 400)); t.insert(batch(400, 800))
    val deleted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val deleter = new Thread(() => {
      try {
        var i = 0L
        while (i < 20) {
          if (DeleteVectors.deleteWhere(t, col("id") === i * 11) == 1) deleted.add(i * 11)
          i += 1
        }
      } catch { case e: Throwable => errors.add(e) } finally stop.set(true)
    }, "dvc-dml-deleter")
    val updater = new Thread(() => {
      try {
        while (!stop.get()) {
          try t.updateWhere(col("id") % 5 === 1, Seq("v" -> lit("u")))
          catch { case _: CommitConflictException => () } // dv moved: retry
          Thread.sleep(1)
        }
      } catch { case e: Throwable => errors.add(e) }
    }, "dvc-dml-updater")
    deleter.start(); updater.start()
    deleter.join(120000); updater.join(120000)
    assert(errors.isEmpty, s"background failure: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val del = deleted.asScala.toSet
    val remaining = t.read().select("id").collect().map(_.getLong(0)).toSet
    assert((del intersect remaining).isEmpty,
      s"resurrected: ${del intersect remaining}")
    assert(remaining.size == 800 - del.size)
    // a final quiesced update reaches every surviving id%5==1 row
    t.updateWhere(col("id") % 5 === 1, Seq("v" -> lit("u")))
    val unUpdated = t.read()
      .where(col("id") % 5 === 1 && col("v") =!= "u").count()
    assert(unUpdated == 0, s"$unUpdated survivors missed the update")
  }

  test("dv rewrite with explicit sources never drops marks committed after its snapshot") {
    val t = mkTable("dvc_vacrace")
    t.insert(batch(0, 100))
    DeleteVectors.deleteWhere(t, col("id") < 5) // dv file A
    val dv = DeleteVectors.dvTable(t)
    val dvSnapA = dv.snapshot()
    val keptFromA = dv.readFiles(dvSnapA, dvSnapA.aliveFiles).localCheckpoint()
    // a concurrent deleteWhere commits dv file B between snapshot and rewrite
    DeleteVectors.deleteWhere(t, col("id") === 50L)
    dv.rewriteTable(keptFromA, sources = Some(dvSnapA.aliveFiles))
    // both delete sets still apply: B survived the rewrite
    assert(t.read().count() == 94, "mark committed mid-rewrite was dropped")
    // and vacuum (which now runs the same shape under the main lock)
    // reclaims nothing here since every mark's file is alive
    assert(DeleteVectors.vacuum(t) == 0L)
  }
}
