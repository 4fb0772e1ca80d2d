package graft.operators

import graft.SparkSpec
import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MvSyncSpec extends SparkSpec {
  import spark.implicits._

  private val spec = MvSync.MvSpec(
    groupCols = Seq("grp"), sumCols = Seq("v"), minMaxCols = Seq("v"))

  private def newBase(): IceTable =
    new IceTable(spark, tmpDir("mvsync_base"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(4))),
      sortOrder = Seq("id")))

  private def newMv(): IceTable =
    MvSync.create(spark, tmpDir("mvsync_mv"), spec)

  /** Oracle: full aggregation of the base's current state. */
  private def expected(base: IceTable): DataFrame =
    base.read().groupBy("grp").agg(
      count(lit(1)).as("cnt"), sum("v").as("sum_v"),
      min("v").as("min_v"), max("v").as("max_v"))

  private def drift(a: DataFrame, b: DataFrame): Long = {
    val bb = b.select(a.columns.map(col): _*)
    a.exceptAll(bb).count() + bb.exceptAll(a).count()
  }

  private def settle(): Unit = Thread.sleep(5)

  test("initial sync seeds the view with one full aggregation") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "grp", "v"))
    settle()
    val (p, r) = MvSync.syncFromFeed(base, mv, spec)
    assert(p == 0L && r == 2L)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
  }

  test("insert-only windows append partials, no resets, no base rescan") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    base.insert(Seq((2L, "a", 7L), (3L, "c", 3L)).toDF("id", "grp", "v"))
    settle()
    val (p, r) = MvSync.syncFromFeed(base, mv, spec)
    assert(p == 2L && r == 0L)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    // physical shape: one reset generation + one partial generation
    assert(mv.read().where(!col("is_reset")).count() == 2L)
  }

  test("deleting the group minimum resets the group exactly") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 1L), (2L, "a", 50L), (3L, "b", 9L))
      .toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    // id=1 carries a's minimum: min/max are NOT self-maintainable here
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    settle()
    val (p, r) = MvSync.syncFromFeed(base, mv, spec)
    assert(p == 0L && r == 1L) // only group a rescanned
    val got = MvSync.read(mv, spec).where($"grp" === "a").head
    assert(got.getAs[Long]("cnt") == 1L && got.getAs[Long]("min_v") == 50L)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
  }

  test("CoW update that moves a row across groups resets old, appends new") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    base.updateWhere(col("id") === 1L, Seq("grp" -> lit("b")))
    settle()
    val (p, r) = MvSync.syncFromFeed(base, mv, spec)
    assert(p == 1L && r == 1L) // b gains a partial, a resets (to cnt=0)
    val view = MvSync.read(mv, spec)
    assert(view.where($"grp" === "a").isEmpty) // fully-retracted group drops
    assert(drift(view, expected(base)) == 0L)
  }

  test("a fully deleted group vanishes and a later re-insert revives it") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    base.deleteWhere(col("grp") === "a")
    settle(); MvSync.syncFromFeed(base, mv, spec)
    assert(MvSync.read(mv, spec).where($"grp" === "a").isEmpty)
    base.insert(Seq((9L, "a", 99L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    val got = MvSync.read(mv, spec).where($"grp" === "a").head
    assert(got.getAs[Long]("cnt") == 1L && got.getAs[Long]("sum_v") == 99L)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
  }

  test("null group keys retract null-safely") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, null.asInstanceOf[String], 4L), (2L, null.asInstanceOf[String], 6L),
      (3L, "x", 1L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    settle()
    val (_, r) = MvSync.syncFromFeed(base, mv, spec)
    assert(r == 1L)
    val got = MvSync.read(mv, spec).where($"grp".isNull).head
    assert(got.getAs[Long]("cnt") == 1L && got.getAs[Long]("sum_v") == 6L)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
  }

  test("idle window commits nothing; watermark advances only on activity") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    val logs = mv.history().count()
    assert(MvSync.syncFromFeed(base, mv, spec) == ((0L, 0L)))
    assert(mv.history().count() == logs)
  }

  test("rebase collapses generations, read identical before and after") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    base.insert(Seq((3L, "a", 30L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    DeleteVectors.deleteWhere(base, col("id") === 2L)
    settle(); MvSync.syncFromFeed(base, mv, spec)
    val before = MvSync.read(mv, spec).localCheckpoint(true)
    assert(mv.read().count() > 2L) // fragmented: 3 generations
    val n = MvSync.rebase(base, mv, spec)
    assert(n == 1L) // only group a is live
    assert(mv.read().count() == 1L) // superseded rows reclaimed
    assert(drift(MvSync.read(mv, spec), before) == 0L)
    // the view keeps syncing after a rebase
    base.insert(Seq((4L, "c", 7L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
  }

  test("rebase against a pinned commit floor times out with the cause, then succeeds") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L), (2L, "b", 4L)).toDF("id", "grp", "v"))
    // an open multi-table transaction pins the source's settled bound…
    val txn = graft.ice.IceTransaction.begin(spark)
    txn.insert(base, Seq((3L, "a", 7L)).toDF("id", "grp", "v"))
    settle()
    MvSync.syncFromFeed(base, mv, spec) // wm lands just below the pin
    // …so rebase cannot find a generation strictly past the watermark:
    // it must back off and bail with the cause, not spin the driver
    val t0 = System.currentTimeMillis()
    val ex = intercept[IllegalStateException](
      MvSync.rebase(base, mv, spec, settleTimeoutMs = 250L))
    assert(ex.getMessage.contains("pinning"))
    assert(System.currentTimeMillis() - t0 >= 250L)
    // once the transaction resolves, the same rebase goes through
    txn.abort()
    settle()
    assert(MvSync.rebase(base, mv, spec) == 2L)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
  }

  test("an MV cannot be the source of another MV (raw partials are not data)") {
    val base = newBase()
    val vd = MvSync.MvViewDef("base", Seq("grp"),
      Seq(MvSync.MvOutput("n", "cnt", ""), MvSync.MvOutput("s", "sum", "v")))
    val mv = MvSync.create(spark, tmpDir("mvsync_mv"), vd.spec, viewDef = Some(vd))
    base.insert(Seq((1L, "a", 10L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, vd.spec)
    val mv2 = MvSync.create(spark, tmpDir("mvsync_mv2"), vd.spec)
    intercept[IllegalArgumentException](MvSync.syncFromFeed(mv, mv2, vd.spec))
    intercept[IllegalArgumentException](MvSync.rebase(mv, mv2, vd.spec))
  }

  test("dim move + same-window fact delete: the OLD group still resets (old-watermark base)") {
    // the trap: after the window, the fact row is gone, so the
    // post-window base joined with the changed dim images can never name
    // the group the MV's standing state reflects — affected-group
    // discovery must also use the base at the OLD watermark
    import graft.ice.{DeleteVectors, IceTableConfig}
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvjw_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvjw_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "Z")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDim = Some(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvjw_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTable = Some(dim))
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 1L, 5L), ("Z", 1L, 9L)))
    // SAME window: the dim row moves A → B AND the fact row deletes
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("B")))
    DeleteVectors.deleteWhere(fact, col("id") === 1L)
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTable = Some(dim))
    // group A (the stale state) retracted, B never materialized, Z intact
    assert(rows() == Seq(("Z", 1L, 9L)))
  }

  test("streaming join view: batches join the pinned dim; a dim move fails loudly, rebase recovers") {
    import graft.ice.{ChangeFeed, IceTableConfig}
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvjs_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvjs_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDim = Some(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvjs_mv"), jspec)
    // batch 1: plain insert images, joined with the pinned dim
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 5L)).toDF("id", "k", "v"))
    settle()
    val b1 = ChangeFeed.between(fact, 0L)
    MvSync.applyFeedBatch(fact, mv, jspec, b1, 1L, "q1",
      dimTable = Some(dim))
    val got = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 1L, 10L), ("B", 1L, 5L)))
    // the dim moves: the NEXT batch must fail loudly, not silently mix
    dim.insert(Seq(("k3", "C")).toDF("k", "cat"))
    settle()
    fact.insert(Seq((3L, "k3", 7L)).toDF("id", "k", "v"))
    settle()
    val wm1 = b1.agg(org.apache.spark.sql.functions.max(
      col(ChangeFeed.CommitTsCol))).head.getLong(0)
    val b2 = ChangeFeed.between(fact, wm1)
    val e = intercept[IllegalStateException](
      MvSync.applyFeedBatch(fact, mv, jspec, b2, 2L, "q1",
        dimTable = Some(dim)))
    assert(e.getMessage.contains("pinned dim"))
    // recovery: rebase under the stream's replica id absorbs the dim
    // change AND every pending fact commit, re-recording the baseline
    // (the stream then restarts from the rebase watermark, so nothing
    // replays twice)
    val rebaseN = MvSync.rebase(fact, mv, jspec, replicaId = "q1",
      dimTable = Some(dim))
    assert(rebaseN == 3L)
    val got2 = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got2 == Seq(("A", 1L, 10L), ("B", 1L, 5L), ("C", 1L, 7L)))
    // the restarted stream's first batch (post-rebase changes only)
    // applies cleanly against the re-recorded baseline
    val wm2 = ChangeFeed.settledNow(fact)
    fact.insert(Seq((4L, "k3", 2L)).toDF("id", "k", "v"))
    settle()
    val b3 = ChangeFeed.between(fact, wm2)
    MvSync.applyFeedBatch(fact, mv, jspec, b3, 3L, "q1",
      dimTable = Some(dim))
    val got3 = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got3 == Seq(("A", 1L, 10L), ("B", 1L, 5L), ("C", 2L, 9L)))
  }

  test("mvSyncSink: the streaming form converges across restarts and DML") {
    import org.apache.spark.sql.streaming.Trigger
    val base = newBase(); val mv = newMv()
    val ckpt = tmpDir("mvsync_ckpt")
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    Thread.sleep(5)
    // empty view + feed from zero: the replayed feed builds it
    val q1 = graft.streaming.Streams.mvSyncSink(base, mv, spec, ckpt,
      trigger = Trigger.AvailableNow())
    q1.awaitTermination()
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    // mutate all three ways, then resume from the SAME checkpoint
    base.insert(Seq((3L, "a", 7L)).toDF("id", "grp", "v"))
    base.updateWhere(col("id") === 2L, Seq("v" -> lit(99L)))
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    Thread.sleep(5)
    val q2 = graft.streaming.Streams.mvSyncSink(base, mv, spec, ckpt,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    val a = MvSync.read(mv, spec).where($"grp" === "a").head
    assert(a.getAs[Long]("cnt") == 1L && a.getAs[Long]("sum_v") == 7L)
  }

  test("compaction folds within a (group, gen, is_reset) cell only") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    base.insert(Seq((2L, "a", 5L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    val before = MvSync.read(mv, spec).localCheckpoint(true)
    mv.optimize()
    // distinct generations survive the merge (cross-gen fold would break
    // the newest-reset-wins read rule)
    assert(mv.read().select("gen").distinct().count() == 2L)
    assert(drift(MvSync.read(mv, spec), before) == 0L)
  }

  test("a transient _dv listing failure fails the sync loudly — never a stale dim pin") {
    // commitVersion's `_dv` side-log listing: NOT-FOUND reads as "no dv
    // commits" (the normal no-dv-table case), but a transient IO blip
    // must PROPAGATE — swallowed, it would pin a stale dim version and a
    // dim-side MoR delete committed in the same interval would slip
    // through join-view maintenance undetected.
    spark.sparkContext.hadoopConfiguration.set("fs.flakydv.impl",
      classOf[graft.ice.FlakyDvFileSystem].getName)
    val fact = new IceTable(spark, tmpDir("mvflaky_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dim = new IceTable(spark, s"flakydv:${tmpDir("mvflaky_dim")}",
      IceTableConfig(partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDim = Some(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvflaky_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTable = Some(dim))
    // the dim-side MoR delete commits ONLY to `_dv`
    graft.ice.DeleteVectors.deleteWhere(dim, col("k") === "k2")
    settle()
    graft.ice.FlakyDvFileSystem.armFailure()
    intercept[java.io.IOException](
      MvSync.syncFromFeed(fact, mv, jspec, dimTable = Some(dim)))
    // the retry (blip gone) maintains against the TRUE dim state: k2's
    // group is retracted, never silently kept on the stale pin
    MvSync.syncFromFeed(fact, mv, jspec, dimTable = Some(dim))
    val got = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 1L, 5L)))
  }
}
