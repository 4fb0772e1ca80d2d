package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level change-feed invariants: inserts, CoW update pairs,
  * merge-on-read deletes, maintenance silence, re-delete silence,
  * windowing, and the cleanup attribution floor. */
class ChangeFeedSpec extends SparkSpec {

  private def maxTs(t: IceTable): Long =
    t.logio.currentLogFiles(t.root).map(f => IceLogIO.logFileInfo(f)._1).max

  private def mk(): IceTable = {
    import spark.implicits._
    val t = new IceTable(spark, tmpDir("graft_cdc"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod(col("u"), lit(2))),
      sortOrder = Seq("id")))
    t.insert((1 to 20).map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "u", "v"))
    t
  }

  private def byType(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("inserts, CoW update pairs, and MoR deletes report exactly once") {
    import spark.implicits._
    val t = mk()
    val t0 = maxTs(t)
    t.insert((21 to 25).map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "u", "v"))
    t.updateWhere(col("id") === 3L, Seq("v" -> lit("updated")))
    DeleteVectors.deleteWhere(t, col("id") === 7L)
    val feed = ChangeFeed.between(t, t0).cache()
    assert(byType(feed) === Map("insert" -> 6L, "delete" -> 2L))
    // the update is a (before, after) image pair at one commit ts
    val images = feed.where(col("id") === 3L)
      .select("_change_type", "v", "_commit_ts").collect()
    assert(images.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("delete", "v3"), ("insert", "updated")))
    assert(images.map(_.getLong(2)).distinct.length === 1)
    // the MoR delete carries the deleted row's content
    val del7 = feed.where(col("id") === 7L).collect()
    assert(del7.map(_.getAs[String]("_change_type")).toSeq === Seq("delete"))
    assert(del7.head.getAs[String]("v") === "v7")
    feed.unpersist()
  }

  test("maintenance is silent: compaction and dv materialize contribute zero rows") {
    import spark.implicits._
    val t = mk()
    t.insert((21 to 30).map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "u", "v"))
    DeleteVectors.deleteWhere(t, col("id") === 5L)
    // the window floor must clear the DV commit too (its log lives under
    // _dv and is typically newer than the last main commit)
    val t1 = math.max(maxTs(t), maxTs(DeleteVectors.dvTable(t)))
    assert(t.optimize() > 0)
    DeleteVectors.materialize(t)
    DeleteVectors.vacuum(t)
    assert(ChangeFeed.between(t, t1).count() === 0L,
      "content-preserving rewrites must not appear in the feed")
  }

  test("re-marking an already-deleted row never re-reports it") {
    val t = mk()
    DeleteVectors.deleteWhere(t, col("id") === 2L)
    val t1 = maxTs(DeleteVectors.dvTable(t))
    DeleteVectors.deleteWhere(t, col("id") <= 2L) // re-marks 2, newly marks 1
    val feed = ChangeFeed.between(t, t1)
    assert(feed.select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("windows slice by commit ts; full-history window sees the seed insert") {
    val t = mk()
    val full = ChangeFeed.between(t, 0L)
    assert(byType(full) === Map("insert" -> 20L))
    assert(ChangeFeed.between(t, maxTs(t)).count() === 0L)
  }

  test("many dv commits in one window collapse: per-commit ts exact, re-marks silent") {
    val t = mk()
    val t0 = math.max(maxTs(t),
      t.logio.currentLogFiles(DeleteVectors.dvTable(t).root)
        .map(f => IceLogIO.logFileInfo(f)._1).maxOption.getOrElse(Long.MinValue))
    // five separate dv commits; the middle ones re-mark earlier victims
    DeleteVectors.deleteWhere(t, col("id") === 2L)
    val dvTs1 = maxTs(DeleteVectors.dvTable(t))
    DeleteVectors.deleteWhere(t, col("id") === 4L)
    DeleteVectors.deleteWhere(t, col("id") <= 4L) // re-marks 2,4; news 1,3
    DeleteVectors.deleteWhere(t, col("id") === 6L)
    DeleteVectors.deleteWhere(t, col("id").isin(6L, 8L)) // re-marks 6; news 8
    val feed = ChangeFeed.between(t, t0).cache()
    // each victim reports exactly once, with content, as a delete
    assert(byType(feed) === Map("delete" -> 6L))
    assert(feed.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 6L, 8L))
    // first-report attribution: id=2 carries its FIRST commit's ts, not
    // the re-mark's
    val ts2 = feed.where(col("id") === 2L).select("_commit_ts").head.getLong(0)
    assert(ts2 === dvTs1)
    // commit timestamps are distinct per dv commit, not flattened to one
    assert(feed.select("_commit_ts").distinct().count() === 5L)
    feed.unpersist()
  }

  test("betweenSettled chains windows without losing a boundary commit") {
    import spark.implicits._
    val t = mk()
    Thread.sleep(3) // the settled now-1 bound must pass the seed commit
    val (w1, until1) = ChangeFeed.betweenSettled(t, 0L)
    assert(byType(w1) === Map("insert" -> 20L))
    Thread.sleep(3) // let the settled bound pass the seed commits
    t.insert(Seq((50L, 1, "v50")).toDF("id", "u", "v"))
    DeleteVectors.deleteWhere(t, col("id") === 50L)
    Thread.sleep(3)
    val (w2, until2) = ChangeFeed.betweenSettled(t, until1)
    assert(until2 > until1)
    assert(byType(w2) === Map("insert" -> 1L, "delete" -> 1L))
    // nothing left after the chained windows
    val (w3, _) = ChangeFeed.betweenSettled(t, until2)
    assert(w3.count() === 0L)
    // the empty window still carries the full feed schema (table columns
    // + meta), so consumers that union windows survive it
    assert(w3.columns.toSet === w1.columns.toSet)
  }

  test("cleanup floors at the consolidation HORIZON, not its own commit ts") {
    import spark.implicits._
    val t = mk()
    t.insert((21 to 25).map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "u", "v"))
    t.optimize()
    val horizon = maxTs(t) // the merged log the cleanup will consolidate
    Thread.sleep(3)
    t.tombstoneCleanup(0L)
    val cleanupTs = maxTs(t)
    assert(cleanupTs > horizon)
    val e = intercept[IllegalArgumentException] { ChangeFeed.between(t, 0L) }
    assert(e.getMessage.contains("consolidated"))
    // a consumer caught up to the horizon — but BEHIND the cleanup
    // commit — keeps working: the consolidation itself contributes
    // nothing (it is content-preserving), so this must NOT brick the feed
    assert(ChangeFeed.between(t, horizon).count() === 0L)
    t.insert(Seq((99L, 1, "v99")).toDF("id", "u", "v"))
    assert(byType(ChangeFeed.between(t, horizon)) === Map("insert" -> 1L))
    assert(byType(ChangeFeed.between(t, cleanupTs)) === Map("insert" -> 1L))
  }

  test("RESTORE's dv rollback resurrects rows in the feed; dv maintenance stays silent") {
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    Thread.sleep(2)
    val preTs = System.currentTimeMillis()
    Thread.sleep(2)
    DeleteVectors.deleteWhere(t, col("id") === 7L)
    val w1End = math.max(maxTs(t), maxTs(DeleteVectors.dvTable(t)))
    assert(byType(ChangeFeed.between(t, 0L, w1End)) === Map("insert" -> 20L,
      "delete" -> 1L))
    // a replica synced AFTER the delete (no id 7) must converge across
    // the rollback purely through the feed
    val tgt = new IceTable(spark, tmpDir("graft_cdc_tgt"), IceTableConfig(
      partitionExpr = concat(lit("m="), pmod(col("id"), lit(3))),
      sortOrder = Seq("u")))
    CdcApply.applyTo(t, tgt, Seq("id"))
    assert(tgt.read().where(col("id") === 7L).count() === 0L)

    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preTs").collect()
    finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
    // the un-delete is a feed event: one insert image with the row content
    val w2 = ChangeFeed.between(t, w1End).cache()
    assert(byType(w2) === Map("insert" -> 1L))
    assert(w2.where(col("id") === 7L).select("v").head.getString(0) === "v7")
    w2.unpersist()
    Thread.sleep(3)
    CdcApply.catchUp(t, tgt, Seq("id"))
    assert(tgt.read().where(col("id") === 7L).count() === 1L)

    // dv maintenance is still silent: a fresh delete, then mark
    // compaction + materialize + vacuum contribute nothing
    DeleteVectors.deleteWhere(t, col("id") === 8L)
    val w3End = math.max(maxTs(t), maxTs(DeleteVectors.dvTable(t)))
    assert(DeleteVectors.dvTable(t).optimize(
      maxFileSize = 1L << 30, maxFileCount = 100) >= 0)
    DeleteVectors.materialize(t)
    DeleteVectors.vacuum(t)
    assert(ChangeFeed.between(t, w3End).count() === 0L,
      "mark compaction / materialize / vacuum must not resurrect")
  }

  test("revive → NEW dv delete → RESTORE still emits the resurrect (born-after-revive)") {
    // the exclusion must be mark-CREATION-aware: a revive only re-emitted
    // rows dead under marks that EXISTED at the revive; a mark born after
    // it had its delete emitted at its own commit, so its retirement must
    // resurrect — keying on retirement-vs-revive ts alone silenced this
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    Thread.sleep(2)
    val preDelete = System.currentTimeMillis()
    Thread.sleep(2)
    t.deleteWhere(lit(true)) // CoW: tombstones every file
    val w0 = maxTs(t)
    Thread.sleep(2)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try {
      // t1 (in-window): RESTORE revives the seed files — full re-emit
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preDelete")
        .collect()
      Thread.sleep(2)
      val preMark = System.currentTimeMillis()
      Thread.sleep(2)
      // t2: a NEW mark, born after the revive — its delete is emitted
      DeleteVectors.deleteWhere(t, col("id") === 7L)
      val delTs = maxTs(DeleteVectors.dvTable(t))
      // t3: retire the t2 mark (main side is a no-op restore)
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preMark")
        .collect()
      val feed = ChangeFeed.between(t, w0).cache()
      assert(byType(feed) === Map("insert" -> 21L, "delete" -> 1L))
      val ev7 = feed.where(col("id") === 7L)
        .select("_change_type", "_commit_ts").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      assert(ev7.map(_._1).toSeq === Seq("insert", "delete", "insert"),
        s"born-after-revive retirement must resurrect; got ${ev7.toSeq}")
      assert(ev7(1)._2 === delTs && ev7(2)._2 > delTs)
      feed.unpersist()
      assert(t.read().count() === 20L)
    } finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
  }

  test("re-mark after an in-window resurrect reports the delete (dead→alive→dead)") {
    // pair dead at the window START, resurrected mid-window (restore
    // retires its mark), then MoR-deleted AGAIN: the `seen` baseline must
    // not suppress the second delete — the window must net to DEAD
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    Thread.sleep(2)
    val preMark = System.currentTimeMillis()
    Thread.sleep(2)
    DeleteVectors.deleteWhere(t, col("id") === 7L) // dead BEFORE the window
    val w0 = math.max(maxTs(t), maxTs(DeleteVectors.dvTable(t)))
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try {
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preMark")
        .collect() // retires the mark: resurrect insert
      DeleteVectors.deleteWhere(t, col("id") === 7L) // RE-mark: must report
      val feed = ChangeFeed.between(t, w0).cache()
      assert(byType(feed) === Map("insert" -> 1L, "delete" -> 1L))
      val ev = feed.where(col("id") === 7L)
        .select("_change_type", "_commit_ts").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      assert(ev.map(_._1).toSeq === Seq("insert", "delete"),
        s"window must net to dead; got ${ev.toSeq}")
      feed.unpersist()
      assert(t.read().where(col("id") === 7L).count() === 0L)
    } finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
  }

  test("mark → retire → re-mark inside one window emits BOTH deletes") {
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    val w0 = maxTs(t)
    Thread.sleep(2)
    val preMark = System.currentTimeMillis()
    Thread.sleep(2)
    DeleteVectors.deleteWhere(t, col("id") === 7L) // t1: delete emitted
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try {
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preMark")
        .collect() // t_a: resurrect insert
      DeleteVectors.deleteWhere(t, col("id") === 7L) // t2: must emit AGAIN
      val feed = ChangeFeed.between(t, w0).cache()
      assert(byType(feed) === Map("insert" -> 1L, "delete" -> 2L))
      val ev = feed.where(col("id") === 7L)
        .select("_change_type").collect().map(_.getString(0))
      assert(ev.count(_ == "delete") === 2 && ev.count(_ == "insert") === 1)
      feed.unpersist()
      assert(t.read().where(col("id") === 7L).count() === 0L)
    } finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
  }

  test("a dv-side mark REVIVAL re-kills its rows in the feed") {
    // mark (delete) → restore retires it (insert) → SECOND restore to a
    // point where the mark was alive re-lists it via a merged dv commit:
    // the pair dies again and the feed must say so — mark revivals are
    // kill events exactly like re-marks
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    val w0 = maxTs(t)
    Thread.sleep(2)
    val preMark = System.currentTimeMillis()
    Thread.sleep(2)
    DeleteVectors.deleteWhere(t, col("id") === 7L) // t1: delete
    Thread.sleep(2)
    val markAlivePt = System.currentTimeMillis() // mark alive here
    Thread.sleep(2)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try {
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preMark")
        .collect() // t2: retires the mark → resurrect insert
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $markAlivePt")
        .collect() // t3: REVIVES the mark (merged dv commit) → delete
      assert(t.read().where(col("id") === 7L).count() === 0L)
      val feed = ChangeFeed.between(t, w0).cache()
      assert(byType(feed) === Map("insert" -> 1L, "delete" -> 2L),
        "the revival must emit a second delete")
      val ev = feed.where(col("id") === 7L)
        .select("_change_type", "_commit_ts").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      assert(ev.map(_._1).toSeq === Seq("delete", "insert", "delete"),
        s"got ${ev.toSeq}")
      feed.unpersist()
    } finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
  }

  test("a revive never re-emits rows still dead under ALIVE marks") {
    // main-only revive semantics: restore to a point where mark M1 was
    // already alive — M1 survives the dv-side restore, so the revived
    // file's dv-dead row must NOT re-enter the feed (the table hides it;
    // emitting it raw would resurrect it on every replica)
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    DeleteVectors.deleteWhere(t, col("id") === 7L) // M1
    Thread.sleep(2)
    val betweenPt = System.currentTimeMillis() // M1 alive here
    Thread.sleep(2)
    t.deleteWhere(lit(true)) // CoW: tombstones every file
    val w0 = math.max(maxTs(t), maxTs(DeleteVectors.dvTable(t)))
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try {
      spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $betweenPt")
        .collect() // revives the files; M1 stays ALIVE
      assert(t.read().count() === 19L) // table hides id 7
      val feed = ChangeFeed.between(t, w0).cache()
      assert(byType(feed) === Map("insert" -> 19L),
        "the revive must re-emit only VISIBLE rows")
      assert(feed.where(col("id") === 7L).count() === 0L)
      feed.unpersist()
    } finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
  }

  test("single window insert → dv delete → RESTORE emits the resurrect insert") {
    // regression (ADVICE r9): the resurrect exclusion used to cover every
    // in-window insert file, so a window holding a file's insert (t1), a
    // MoR delete of its rows (t2), and a RESTORE retiring the marks (t3,
    // main side a no-op) netted to delete-wins while the table held the
    // rows alive — forking CDC replicas. The exclusion is now revive-only
    // and ordering-aware.
    import spark.implicits._
    val t = mk()
    val wh = new java.io.File(t.root).getParent
    val name = new java.io.File(t.root).getName
    val t0 = maxTs(t) // window starts AFTER the seed insert
    // replica seeded NOW (initial sync = the seed snapshot), so catchUp
    // below consumes the problem window purely through the feed
    val tgt = new IceTable(spark, tmpDir("graft_cdc_tgt2"), IceTableConfig(
      partitionExpr = concat(lit("m="), pmod(col("id"), lit(3))),
      sortOrder = Seq("u")))
    Thread.sleep(2)
    assert(CdcApply.applyTo(t, tgt, Seq("id")).initialSync)
    Thread.sleep(2)
    t.insert((21 to 25).map(i => (i.toLong, i % 5, s"v$i")).toDF("id", "u", "v"))
    Thread.sleep(2)
    val preTs = System.currentTimeMillis() // between the insert and the delete
    Thread.sleep(2)
    DeleteVectors.deleteWhere(t, col("id") === 22L)
    val delTs = maxTs(DeleteVectors.dvTable(t))
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    try spark.sql(s"RESTORE TABLE graft.`$name` TO TIMESTAMP AS OF $preTs").collect()
    finally spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)

    val feed = ChangeFeed.between(t, t0).cache()
    // 5 inserts at t1, the delete at t2, AND the resurrect insert at t3
    assert(byType(feed) === Map("insert" -> 6L, "delete" -> 1L))
    val ev22 = feed.where(col("id") === 22L)
      .select("_change_type", "_commit_ts", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._2)
    assert(ev22.map(_._1).toSeq === Seq("insert", "delete", "insert"),
      "the retirement must re-emit the row: the window's LAST event for a " +
        "live row must be an insert")
    assert(ev22.last._2 > delTs && ev22.forall(_._3 == "v22"))
    feed.unpersist()

    // replay convergence: the replica consumes this window through the
    // feed and must hold the row (the pre-fix feed dropped it)
    Thread.sleep(3)
    CdcApply.catchUp(t, tgt, Seq("id"))
    assert(tgt.read().where(col("id") === 22L).count() === 1L)
    assert(tgt.read().count() === t.read().count())
  }
}
