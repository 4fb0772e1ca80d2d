package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC consumer invariants: initial sync, incremental windows collapse
  * to one final change per key, replay convergence, maintenance
  * silence, idle polls write nothing, and reseed generations. */
class CdcApplySpec extends SparkSpec {

  private val keys = Seq("id")

  private def mkSource(): IceTable = {
    import spark.implicits._
    val t = new IceTable(spark, tmpDir("cdca_src"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod(col("u"), lit(2))),
      sortOrder = Seq("id")))
    t.insert((1 to 20).map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "u", "v"))
    t
  }

  private def mkTarget(): IceTable =
    new IceTable(spark, tmpDir("cdca_tgt"), IceTableConfig(
      partitionExpr = concat(lit("m="), pmod(col("id"), lit(3))),
      sortOrder = Seq("u")))

  private def rows(t: IceTable): Set[(Long, Int, String)] =
    t.read().select("id", "u", "v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def settle(): Unit = Thread.sleep(3)

  test("initial sync then incremental append/update/delete converge the replica") {
    import spark.implicits._
    val src = mkSource()
    val tgt = mkTarget()
    val seed = CdcApply.applyTo(src, tgt, keys)
    assert(seed.initialSync && seed.upserted === 20L)
    assert(rows(tgt) === rows(src))
    assert(CdcApply.watermark(tgt).contains(seed.watermark))

    src.insert(Seq((21L, 1, "v21"), (22L, 2, "v22")).toDF("id", "u", "v"))
    src.updateWhere(col("id") === 3L, Seq("v" -> lit("updated")))
    DeleteVectors.deleteWhere(src, col("id") === 7L)
    settle()
    val r = CdcApply.catchUp(src, tgt, keys)
    assert(r.deleted === 1L)
    // finals per key: 21,22 inserted + id=3's update pair collapsed to
    // its insert half
    assert(r.upserted === 3L)
    assert(rows(tgt) === rows(src))
    assert(rows(tgt).exists(_ == ((3L, 3, "updated"))) &&
      !rows(tgt).exists(_._1 == 7L))
  }

  test("fresh-replica initial sync is a direct insert: no join in any plan") {
    import spark.implicits._
    val src = mkSource()
    val tgt = mkTarget()
    // every action the sync runs must be join-free: a fresh replica's
    // snapshot copy used to route through upsert's key-join against an
    // empty target — at 100 TB that is a full-corpus shuffle for nothing
    val joins = new java.util.concurrent.atomic.AtomicInteger(0)
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        joins.addAndGet(qe.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }.size); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      val seed = CdcApply.applyTo(src, tgt, keys)
      org.apache.spark.graft.TestListenerBus.waitUntilEmpty(spark.sparkContext)
      assert(seed.initialSync && seed.upserted === 20L)
      assert(joins.get() === 0, s"initial sync ran ${joins.get()} join(s)")
    } finally spark.listenerManager.unregister(ql)
    assert(rows(tgt) === rows(src))

    // crash-replay shape: commits exist but the watermark was never
    // written — the retry must take the (idempotent) upsert branch and
    // converge without duplicating rows
    val tgt2 = mkTarget()
    tgt2.insert(src.read().limit(5)) // "crashed" partial initial insert
    assert(CdcApply.watermark(tgt2).isEmpty)
    val retry = CdcApply.applyTo(src, tgt2, keys)
    assert(retry.initialSync)
    assert(rows(tgt2) === rows(src), "replay must converge, not duplicate")
  }

  test("insert-then-delete inside one window never reaches the replica") {
    import spark.implicits._
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    src.insert(Seq((99L, 0, "ghost")).toDF("id", "u", "v"))
    src.deleteWhere(col("id") === 99L)
    src.insert(Seq((50L, 0, "keep")).toDF("id", "u", "v"))
    settle()
    val r = CdcApply.catchUp(src, tgt, keys)
    assert(!rows(tgt).exists(_._1 == 99L))
    assert(rows(tgt).exists(_ == ((50L, 0, "keep"))))
    assert(rows(tgt) === rows(src))
    assert(r.deleted <= 1L) // ghost's delete may or may not find a row
  }

  test("delete-then-reinsert inside one window lands the reinserted content") {
    import spark.implicits._
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    src.deleteWhere(col("id") === 4L)
    src.insert(Seq((4L, 4, "reborn")).toDF("id", "u", "v"))
    settle()
    CdcApply.catchUp(src, tgt, keys)
    assert(rows(tgt).exists(_ == ((4L, 4, "reborn"))))
    assert(rows(tgt) === rows(src))
  }

  test("maintenance between windows is silent and idle polls write no commits") {
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    settle()
    assert(src.optimize() >= 0)
    settle()
    val logsBefore = tgt.logio.currentLogFiles(tgt.root).size
    val r = CdcApply.applyTo(src, tgt, keys)
    assert(r.upserted === 0L && r.deleted === 0L)
    assert(tgt.logio.currentLogFiles(tgt.root).size === logsBefore,
      "an empty window must not commit to the target log")
    assert(rows(tgt) === rows(src))
  }

  test("replaying an already-applied state converges instead of duplicating") {
    import spark.implicits._
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    src.insert(Seq((30L, 0, "x")).toDF("id", "u", "v"))
    settle()
    CdcApply.catchUp(src, tgt, keys)
    // crash-replay stand-in: a NEW generation has no watermark, so it
    // re-runs initial sync over the already-populated replica — upsert
    // must replace, not duplicate
    val gen2 = CdcApply.reseed("default")
    assert(gen2 === "default#gen1" && CdcApply.reseed(gen2) === "default#gen2")
    val r = CdcApply.applyTo(src, tgt, keys, gen2)
    assert(r.initialSync)
    assert(tgt.read().count() === src.read().count())
    assert(rows(tgt) === rows(src))
  }

  test("randomized DML sequences converge the replica at every sync point") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L) // deterministic
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    var nextId = 100L
    (1 to 4).foreach { round =>
      // 3 random ops per window from {append, update, CoW delete, MoR
      // delete, compact}; compaction must be change-feed-silent
      (1 to 3).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 =>
            src.insert(Seq((nextId, rnd.nextInt(5), s"n$nextId"))
              .toDF("id", "u", "v"))
            nextId += 1
          case 1 =>
            val pick = 1L + rnd.nextInt(20)
            src.updateWhere(col("id") === pick,
              Seq("v" -> lit(s"r$round-$pick")))
          case 2 =>
            src.deleteWhere(col("id") === (1L + rnd.nextInt(20)))
          case 3 =>
            DeleteVectors.deleteWhere(src, col("id") === (1L + rnd.nextInt(20)))
          case 4 =>
            src.optimize()
        }
      }
      settle()
      CdcApply.catchUp(src, tgt, keys)
      assert(rows(tgt) === rows(src), s"diverged after window $round")
    }
  }

  test("randomized DML + RESTORE sequences converge the replica at every sync point") {
    // RESTORE is the op whose feed semantics carry the most ordering
    // subtlety (revive re-emits, mark retirements resurrect, exclusions
    // are creation-ts-aware) — stress it mixed with every other mutation
    // kind, asserting replica convergence after every window
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L) // deterministic
    val src = mkSource()
    val tgt = mkTarget()
    val wh = new java.io.File(src.root).getParent
    val name = new java.io.File(src.root).getName
    CdcApply.applyTo(src, tgt, keys)
    var nextId = 200L
    val points = scala.collection.mutable.Buffer.empty[Long]
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try {
      (1 to 6).foreach { round =>
        Thread.sleep(3)
        points += System.currentTimeMillis()
        Thread.sleep(3)
        def restoreTo(pt: Long): Unit =
          spark.sql(
            s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $pt").collect()
        (1 to 3).foreach { _ =>
          rnd.nextInt(6) match {
            case 0 =>
              src.insert(Seq((nextId, rnd.nextInt(5), s"n$nextId"))
                .toDF("id", "u", "v"))
              nextId += 1
            case 1 =>
              src.updateWhere(col("id") === (1L + rnd.nextInt(20)),
                Seq("v" -> lit(s"r$round")))
            case 2 =>
              src.deleteWhere(col("id") === (1L + rnd.nextInt(20)))
            case 3 =>
              DeleteVectors.deleteWhere(src, col("id") === (1L + rnd.nextInt(20)))
            case 4 =>
              src.optimize()
            case 5 =>
              restoreTo(points(rnd.nextInt(points.length)))
          }
        }
        if (round == 3) {
          // forced resurrect shape regardless of the random draws:
          // MoR-delete then restore to just before it, in one window
          Thread.sleep(2)
          val pt = System.currentTimeMillis()
          Thread.sleep(2)
          DeleteVectors.deleteWhere(src, col("id") === 2L)
          restoreTo(pt)
        }
        settle()
        CdcApply.catchUp(src, tgt, keys)
        assert(rows(tgt) === rows(src), s"diverged after window $round")
      }
    } finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
  }

  test("a replica polling DURING a concurrent writer converges to the final state") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    val writer = Future {
      (30 to 45).foreach { i =>
        src.insert(Seq((i.toLong, i % 5, s"w$i")).toDF("id", "u", "v"))
        if (i % 4 == 0)
          src.updateWhere(col("id") === (i - 2L), Seq("v" -> lit(s"u$i")))
        if (i % 5 == 0) src.deleteWhere(col("id") === (i - 1L))
      }
    }
    // poll while the writer runs: every window must apply cleanly even
    // though commits land mid-poll (settled bounds guarantee no commit
    // is split across windows)
    while (!writer.isCompleted)
      CdcApply.applyTo(src, tgt, keys)
    Await.result(writer, 120.seconds)
    settle()
    CdcApply.catchUp(src, tgt, keys)
    assert(rows(tgt) === rows(src))
  }

  test("a dv delete commits strictly after the newest main commit it covers") {
    import spark.implicits._
    def maxTs(t: IceTable): Long = t.logio.currentLogFiles(t.root)
      .map(f => IceLogIO.logFileInfo(f)._1).max
    val src = mkSource() // insert commits "now"
    // NO sleep: the mark lands in the same wall millisecond as the
    // insert it covers; the appender must still order it strictly later,
    // or a key-level collapse (insert-wins ties) would resurrect the row
    DeleteVectors.deleteWhere(src, col("id") === 1L)
    assert(maxTs(DeleteVectors.dvTable(src)) > maxTs(src))
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    assert(!rows(tgt).exists(_._1 == 1L))
  }

  test("schema evolution in the window reaches the replica") {
    import spark.implicits._
    val src = mkSource()
    val tgt = mkTarget()
    CdcApply.applyTo(src, tgt, keys)
    src.insert(Seq((40L, 1, "v40", "extra")).toDF("id", "u", "v", "w"))
    settle()
    CdcApply.catchUp(src, tgt, keys)
    val w = tgt.read().where(col("id") === 40L).select("w").collect()
    assert(w.map(_.getString(0)).toSeq === Seq("extra"))
    assert(tgt.read().where(col("id") === 1L).select("w")
      .collect().head.isNullAt(0))
  }
}
