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
    // post-rebase steady state: the flat-mark proof removes the
    // newest-reset-wins fold — the read plan carries NO Window node (and
    // so no MV-sized exchange), it is scan + projection
    val flatPlan = MvSync.read(mv, spec).queryExecution.executedPlan.toString
    assert(!flatPlan.contains("Window"),
      s"expected a fold-free post-rebase read, got:\n$flatPlan")
    // the view keeps syncing after a rebase
    base.insert(Seq((4L, "c", 7L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    // the new partial generation self-invalidates the flat proof: the
    // fold is back on (fail-safe direction)
    val foldPlan = MvSync.read(mv, spec).queryExecution.executedPlan.toString
    assert(foldPlan.contains("Window"),
      s"expected the fold to return after new partials, got:\n$foldPlan")
  }

  test("flat proof self-invalidates even when the maintenance writer's clock lags the rebase host") {
    val base = newBase(); val mv = newMv()
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, spec)
    MvSync.rebase(base, mv, spec)
    assert(mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot),
      "rebase must arm the flat proof")
    // A maintenance writer on a host whose wall clock LAGS the rebasing
    // host: its partial insert must still land ABOVE the flat mark
    // (observed-log commit floor + final-commit-ts marker stamping), or
    // isFlatSnapshot would keep "proving" flat and the fold-free read
    // would serve reset+partial rows per group — silent duplication.
    val lag = System.currentTimeMillis() - 3_600_000L
    val laggedMv = new IceTable(spark, mv.root, mv.cfg, () => lag)
    base.insert(Seq((3L, "a", 30L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, laggedMv, spec)
    val snap = laggedMv.trySnapshot(Long.MaxValue).get
    assert(!MvSync.isFlatSnapshot(snap),
      "a lagging-clock partial insert must self-invalidate the flat proof")
    assert(drift(MvSync.read(laggedMv, spec), expected(base)) == 0L)
    // and the fold is demonstrably back on
    val plan = MvSync.read(laggedMv, spec).queryExecution.executedPlan.toString
    assert(plan.contains("Window"),
      s"expected the fold after a lagging-clock partial, got:\n$plan")
  }

  test("flat fast-path reads present the FOLD's schema: decimal sums widen identically") {
    // foldPartials' sum over a stored decimal WIDENS the type
    // (decimal(p,s) → decimal(p+10,s)); the flat branch must cast the
    // stored columns to the fold's own output types or the two paths
    // would present different schemas to downstream consumers
    import graft.ice.IceTableConfig
    val base = new IceTable(spark, tmpDir("mvdec_base"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dspec = MvSync.MvSpec(Seq("grp"), sumCols = Seq("d"))
    val mv = MvSync.create(spark, tmpDir("mvdec_mv"), dspec)
    base.insert(Seq((1L, "a", BigDecimal("1.50")), (2L, "a", BigDecimal("2.25")),
      (3L, "b", BigDecimal("0.75"))).toDF("id", "grp", "d"))
    settle()
    MvSync.syncFromFeed(base, mv, dspec)
    val foldedSchema = MvSync.read(mv, dspec).schema
    MvSync.rebase(base, mv, dspec)
    val flat = MvSync.read(mv, dspec)
    assert(!flat.queryExecution.executedPlan.toString.contains("Window"))
    assert(flat.schema == foldedSchema,
      s"flat path schema ${flat.schema} != fold schema $foldedSchema")
    val got = flat.orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    assert(got.map(_._1) == Seq("a", "b") && got.map(_._2) == Seq(2L, 1L))
    assert(BigDecimal(got.head._3) == BigDecimal("3.75") &&
      BigDecimal(got(1)._3) == BigDecimal("0.75"))
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
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvjw_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 1L, 5L), ("Z", 1L, 9L)))
    // SAME window: the dim row moves A → B AND the fact row deletes
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("B")))
    DeleteVectors.deleteWhere(fact, col("id") === 1L)
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    // group A (the stale state) retracted, B never materialized, Z intact
    assert(rows() == Seq(("Z", 1L, 9L)))
  }

  test("exact count(distinct): per-(group,value) side state is exact and retractable through DML + rebase") {
    import graft.ice.DeleteVectors
    val base = newBase()
    val xspec = MvSync.MvSpec(Seq("grp"), sumCols = Seq("v"),
      exactDistinctCols = Seq("v"))
    val mv = MvSync.create(spark, tmpDir("mvxd_mv"), xspec)
    def oracle(): DataFrame = base.read().groupBy("grp").agg(
      count(lit(1)).as("cnt"), sum("v").as("sum_v"),
      countDistinct(col("v")).as("xd_v"))
    def check(): Unit =
      assert(drift(MvSync.read(mv, xspec), oracle()) == 0L)

    // duplicate values within and across groups, plus a null (ANSI:
    // count(distinct) ignores nulls)
    base.insert(Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 10L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, xspec)
    check()
    assert(MvSync.read(mv, xspec).where($"grp" === "a").head
      .getAs[Long]("xd_v") == 2L)
    // insert-only window: a NEW value and a DUPLICATE of an existing one
    base.insert(Seq((5L, "a", 30L), (6L, "a", 10L)).toDF("id", "grp", "v"))
    settle(); MvSync.syncFromFeed(base, mv, xspec)
    check() // a: {10,20,30} = 3
    // retraction: deleting ONE of the two id 10-value rows must NOT drop
    // the value; deleting the last 20-value row must
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    DeleteVectors.deleteWhere(base, col("id") === 3L)
    settle(); MvSync.syncFromFeed(base, mv, xspec)
    check() // a: {10, 30} = 2 — refcount semantics, not set-forgetting
    assert(MvSync.read(mv, xspec).where($"grp" === "a").head
      .getAs[Long]("xd_v") == 2L)
    // CoW update moving a value across groups
    base.updateWhere(col("id") === 4L, Seq("grp" -> lit("a")))
    settle(); MvSync.syncFromFeed(base, mv, xspec)
    check()
    // rebase collapses main AND side generations; exactness survives
    MvSync.rebase(base, mv, xspec)
    check()
    // the side view itself went flat too (scan-only read)
    val side = MvSync.xdTable(mv, xspec, "v")
    assert(side.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot),
      "rebase must re-arm the side view's flat proof")
  }

  test("LEFT JOIN dim view: null-extension, dim arrival/departure, deletes — exact through the signed path") {
    import graft.ice.{DeleteVectors, IceTableConfig}
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvlj_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvlj_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k", "left")))
    val mv = MvSync.create(spark, tmpDir("mvlj_mv"), jspec)
    def oracle(): DataFrame = fact.read().alias("f")
      .join(dim.read().alias("d"), expr("f.k = d.k"), "left")
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("cnt"), sum(col("f.v")).as("sum_f_v"))
    def check(): Unit =
      assert(drift(MvSync.read(mv, jspec), oracle()) == 0L)

    // seed: k2 has no dim row yet → null-extended group
    dim.insert(Seq(("k1", "A")).toDF("k", "cat"))
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle(); MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    check()
    assert(MvSync.read(mv, jspec).where($"cat".isNull).head
      .getAs[Long]("sum_f_v") == 9L, "unmatched facts must null-extend")

    // dim ARRIVAL (sum-only spec → one-dim move rides the SIGNED path,
    // zero resets): the fact moves null-group → B
    dim.insert(Seq(("k2", "B")).toDF("k", "cat"))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(r1 == 0L, s"dim arrival must stay signed (no resets), got $r1")
    assert(p1 > 0L)
    check()
    assert(MvSync.read(mv, jspec).where($"cat".isNull).isEmpty,
      "the emptied null group must fold out (cnt nets to 0)")

    // dim DEPARTURE: facts fall back to the null group
    dim.deleteWhere(col("k") === "k1")
    settle()
    val (_, r2) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(r2 == 0L, "departure is the same signed algebra")
    check()
    assert(MvSync.read(mv, jspec).where($"cat".isNull).head
      .getAs[Long]("sum_f_v") == 5L)

    // MoR fact delete inside the null group retracts exactly
    DeleteVectors.deleteWhere(fact, col("id") === 1L)
    settle(); MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    check()
    // plain fact insert with no dim row lands in the null group
    fact.insert(Seq((3L, "k9", 4L)).toDF("id", "k", "v"))
    settle(); MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    check()
    // rebase collapses generations; the left join re-derives identically
    MvSync.rebase(fact, mv, jspec, dimTables = Seq(dim))
    check()
  }

  test("LEFT JOIN dim with DUPLICATE keys: signed maintenance never fabricates null-group rows") {
    import graft.ice.IceTableConfig
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvld_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvld_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k", "left")))
    val mv = MvSync.create(spark, tmpDir("mvld_mv"), jspec)
    def oracle(): DataFrame = fact.read().alias("f")
      .join(dim.read().alias("d"), expr("f.k = d.k"), "left")
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("cnt"), sum(col("f.v")).as("sum_f_v"))
    def check(): Unit =
      assert(drift(MvSync.read(mv, jspec), oracle()) == 0L)

    // k1 carries TWO dim rows (fan-out); k2 has none (real null group)
    dim.insert(Seq(("k1", "A"), ("k1", "B")).toDF("k", "cat"))
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle(); MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    check() // A(1,5), B(1,5), null(1,9)

    // delete ONE of k1's rows: the fact still matches (k1,'A') — it must
    // NOT null-extend; the legitimate null group must not be disturbed
    dim.deleteWhere(col("cat") === "B")
    settle()
    val (_, r1) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(r1 == 0L, "one-dim sum-only move must stay signed")
    check()
    val view1 = MvSync.read(mv, jspec)
    assert(view1.where($"cat" <=> "B").isEmpty)
    assert(view1.where($"cat".isNull).head.getAs[Long]("sum_f_v") == 9L,
      "the real null group must hold exactly the unmatched fact")

    // add a SECOND row back under k1: no spurious -1 into the null group
    // (which would wrongly retract the k2 fact)
    dim.insert(Seq(("k1", "C")).toDF("k", "cat"))
    settle()
    val (_, r2) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(r2 == 0L)
    check() // A(1,5), C(1,5), null(1,9)
    assert(MvSync.read(mv, jspec).where($"cat".isNull).head
      .getAs[Long]("cnt") == 1L)
  }

  test("LEFT JOIN dim with min/max: dim moves route through affected-group resets, null group included") {
    import graft.ice.IceTableConfig
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvlm_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvlm_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    val jspec = MvSync.MvSpec(Seq("cat"), minMaxCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k", "left")))
    val mv = MvSync.create(spark, tmpDir("mvlm_mv"), jspec)
    def oracle(): DataFrame = fact.read().alias("f")
      .join(dim.read().alias("d"), expr("f.k = d.k"), "left")
      .groupBy(col("cat")).agg(count(lit(1)).as("cnt"),
        min(col("f.v")).as("min_f_v"), max(col("f.v")).as("max_f_v"))
    def check(): Unit =
      assert(drift(MvSync.read(mv, jspec), oracle()) == 0L)

    dim.insert(Seq(("k1", "A")).toDF("k", "cat"))
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L), (3L, "k2", 3L))
      .toDF("id", "k", "v"))
    settle(); MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    check()

    // dim ARRIVAL: min/max cannot subtract → the affected groups (the
    // null group it leaves, B it enters) reset exactly
    dim.insert(Seq(("k2", "B")).toDF("k", "cat"))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(p1 == 0L && r1 == 2L,
      s"expected exactly {null, B} reset, got ($p1, $r1)")
    check()
    assert(MvSync.read(mv, jspec).where($"cat".isNull).isEmpty)

    // dim DEPARTURE: {A, null} reset; the null group recompute must see
    // the unmatched facts (the isin prune is skipped for it)
    dim.deleteWhere(col("k") === "k1")
    settle()
    val (_, r2) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(r2 == 2L, s"expected {A, null} reset, got $r2")
    check()
    val ng = MvSync.read(mv, jspec).where($"cat".isNull).head
    assert(ng.getAs[Long]("cnt") == 1L && ng.getAs[Long]("min_f_v") == 5L)
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
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvjs_mv"), jspec)
    // batch 1: plain insert images, joined with the pinned dim
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 5L)).toDF("id", "k", "v"))
    settle()
    val b1 = ChangeFeed.between(fact, 0L)
    MvSync.applyFeedBatch(fact, mv, jspec, b1, 1L, "q1",
      dimTables = Seq(dim))
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
        dimTables = Seq(dim)))
    assert(e.getMessage.contains("pinned dim"))
    // recovery: rebase under the stream's replica id absorbs the dim
    // change AND every pending fact commit, re-recording the baseline
    // (the stream then restarts from the rebase watermark, so nothing
    // replays twice)
    val rebaseN = MvSync.rebase(fact, mv, jspec, replicaId = "q1",
      dimTables = Seq(dim))
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
      dimTables = Seq(dim))
    val got3 = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got3 == Seq(("A", 1L, 10L), ("B", 1L, 5L), ("C", 2L, 9L)))
  }

  test("exact count(distinct) composes with a LEFT dim: side views ride the same maintenance recursively") {
    import graft.ice.IceTableConfig
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvxl_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvxl_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    val xspec = MvSync.MvSpec(Seq("cat"),
      exactDistinctCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k", "left")))
    val mv = MvSync.create(spark, tmpDir("mvxl_mv"), xspec)
    def oracle(): DataFrame = fact.read().alias("f")
      .join(dim.read().alias("d"), expr("f.k = d.k"), "left")
      .groupBy(col("cat")).agg(count(lit(1)).as("cnt"),
        countDistinct(col("f.v")).as("xd_f_v"))
    def check(): Unit =
      assert(drift(MvSync.read(mv, xspec), oracle()) == 0L)

    dim.insert(Seq(("k1", "A")).toDF("k", "cat"))
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 10L), (3L, "k2", 20L))
      .toDF("id", "k", "v"))
    settle(); MvSync.syncFromFeed(fact, mv, xspec, dimTables = Seq(dim))
    check()
    assert(MvSync.read(mv, xspec).where($"cat".isNull).head
      .getAs[Long]("xd_f_v") == 2L, "null group must count {10, 20}")

    // dim ARRIVAL: the k2 facts (and their side-state rows) move from
    // the null-extended group into B — main AND side maintained signed
    dim.insert(Seq(("k2", "B")).toDF("k", "cat"))
    settle()
    val (_, r1) = MvSync.syncFromFeed(fact, mv, xspec, dimTables = Seq(dim))
    assert(r1 == 0L, "cnt-only spec stays signed through the dim move")
    check()
    assert(MvSync.read(mv, xspec).where($"cat" === "B").head
      .getAs[Long]("xd_f_v") == 2L)
    assert(MvSync.read(mv, xspec).where($"cat".isNull).isEmpty)

    // rebase collapses main and sides; exactness survives
    MvSync.rebase(fact, mv, xspec, dimTables = Seq(dim))
    check()
  }

  test("streaming LEFT-join view: batches null-extend; autoRebase absorbs a dim arrival into the real group") {
    import graft.ice.{ChangeFeed, IceTableConfig}
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val fact = new IceTable(spark, tmpDir("mvls_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvls_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k", "left")))
    val mv = MvSync.create(spark, tmpDir("mvls_mv"), jspec)
    def rows() = MvSync.read(mv, jspec).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    // batch 1: k2 has no dim row — its fact must null-extend, not vanish
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 5L)).toDF("id", "k", "v"))
    settle()
    val b1 = ChangeFeed.between(fact, 0L).localCheckpoint(true)
    MvSync.applyFeedBatch(fact, mv, jspec, b1, 1L, "ql",
      dimTables = Seq(dim), autoRebase = true)
    assert(rows() == Set((Some("A"), 1L, 10L), (None, 1L, 5L)))
    // the dim arrives for k2: the next batch absorbs the move in-stream
    // (one reset generation) and the null group's fact lands in B
    dim.insert(Seq(("k2", "B")).toDF("k", "cat"))
    settle()
    fact.insert(Seq((3L, "k2", 2L)).toDF("id", "k", "v"))
    settle()
    val wm1 = b1.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    val b2 = ChangeFeed.between(fact, wm1).localCheckpoint(true)
    MvSync.applyFeedBatch(fact, mv, jspec, b2, 2L, "ql",
      dimTables = Seq(dim), autoRebase = true)
    assert(rows() == Set((Some("A"), 1L, 10L), (Some("B"), 2L, 7L)),
      s"got ${rows()}")
    // absorb ran the rebase tail: collapsed + fold-free
    assert(mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot))
    b1.unpersist(); b2.unpersist()
  }

  test("rebase cadence: every Nth batch collapses generations exactly-once and re-arms the fold-free read") {
    import graft.ice.ChangeFeed
    val base = newBase(); val mv = newMv()
    // batch 1: plain delta
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    settle()
    val b1 = ChangeFeed.between(base, 0L).localCheckpoint(true)
    MvSync.applyFeedBatch(base, mv, spec, b1, 1L, "qc",
      rebaseEveryNBatches = 2)
    val wm1 = b1.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    // batch 2 (cadence due): lands as ONE full reset generation, the
    // superseded rows reclaim, and the flat proof re-arms
    base.insert(Seq((3L, "a", 5L)).toDF("id", "grp", "v"))
    settle()
    val b2 = ChangeFeed.between(base, wm1).localCheckpoint(true)
    MvSync.applyFeedBatch(base, mv, spec, b2, 2L, "qc",
      rebaseEveryNBatches = 2)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    assert(mv.read().count() == 2L, "generations must have collapsed")
    assert(mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot),
      "the cadence batch must re-arm the flat proof")
    val flat = MvSync.read(mv, spec).queryExecution.executedPlan.toString
    assert(!flat.contains("Window"), s"expected fold-free read:\n$flat")
    // exactly-once: REPLAYING the cadence batch changes nothing
    val logs = mv.history().count()
    MvSync.applyFeedBatch(base, mv, spec, b2, 2L, "qc",
      rebaseEveryNBatches = 2)
    assert(mv.history().count() == logs, "a replayed cadence batch must skip")
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    assert(mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot))
    // batch 3: a plain delta self-invalidates the proof (fail-safe) and
    // stays correct
    val wm2 = b2.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    base.insert(Seq((4L, "c", 7L)).toDF("id", "grp", "v"))
    settle()
    val b3 = ChangeFeed.between(base, wm2).localCheckpoint(true)
    MvSync.applyFeedBatch(base, mv, spec, b3, 3L, "qc",
      rebaseEveryNBatches = 2)
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    assert(!mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot))
    b1.unpersist(); b2.unpersist(); b3.unpersist()
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

  test("mvSyncSink rebaseEveryNBatches: the stream self-defragments and survives a restart") {
    import org.apache.spark.sql.streaming.Trigger
    val base = newBase(); val mv = newMv()
    val ckpt = tmpDir("mvcad_ckpt")
    base.insert(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"))
    Thread.sleep(5)
    val q1 = graft.streaming.Streams.mvSyncSink(base, mv, spec, ckpt,
      trigger = Trigger.AvailableNow(), rebaseEveryNBatches = 1)
    q1.awaitTermination()
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    // every batch is a cadence batch here: the view stays collapsed and
    // the fold-free read armed after each one
    assert(mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot),
      "cadence must leave the view flat")
    assert(mv.read().count() == 2L, "generations must be collapsed")
    // restart from the same checkpoint after more DML — exactly-once
    // across cadence batches, still flat, still exact
    base.insert(Seq((3L, "a", 7L)).toDF("id", "grp", "v"))
    DeleteVectors.deleteWhere(base, col("id") === 2L)
    Thread.sleep(5)
    val q2 = graft.streaming.Streams.mvSyncSink(base, mv, spec, ckpt,
      trigger = Trigger.AvailableNow(), rebaseEveryNBatches = 1)
    q2.awaitTermination()
    assert(drift(MvSync.read(mv, spec), expected(base)) == 0L)
    assert(mv.trySnapshot(Long.MaxValue).exists(MvSync.isFlatSnapshot))
    assert(mv.read().count() === MvSync.read(mv, spec).count(),
      "one stored row per live group after the cadence rebase")
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

  test("dim-change group discovery prunes the fact scans with a pushed In on the join key") {
    import graft.ice.{ChangeFeed, IceTableConfig}
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    val fact = new IceTable(spark, tmpDir("mvprune_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvprune_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B"), ("k3", "C")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L), (3L, "k3", 2L))
      .toDF("id", "k", "v"))
    settle()
    val wm = ChangeFeed.settledNow(fact)
    // two dim rows move; their images are the discovery input (two keys
    // keep the pushed predicate a genuine In — one key folds to EqualTo)
    dim.updateWhere(col("k").isin("k1", "k2"), Seq("cat" -> lit("Z")))
    settle()
    val images = broadcast(ChangeFeed.between(dim, wm)
      .where(col(ChangeFeed.ChangeTypeCol).isin("insert", "delete"))
      .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol))
    val until = ChangeFeed.settledNow(fact)
    val pinned = dim.read()
    val affected = MvSync.dimChangeAffectedGroups(fact, jspec, images,
      0, wm, until, Seq(pinned), maxPruneGroups = 100)
    // correctness: only the changed keys' groups (old A and B, new Z)
    assert(affected.collect().map(_.getString(0)).toSet == Set("A", "B", "Z"))
    // the scale claim, node-typed: every fact probe carries a pushed
    // In/InSet on the fact join key — discovery reads are
    // changed-keys-sized, never full fact scans
    assert(jspec.joinDims.head.equiKeys.contains(("k", "k")))
    val factScans = affected.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths
            .exists(_.toString.contains("mvprune_fact")) => s
    }
    assert(factScans.nonEmpty)
    assert(factScans.forall(_.dataFilters.exists(e =>
      e.find(x => x.isInstanceOf[In] || x.isInstanceOf[InSet]).nonEmpty)),
      s"fact probes missing the pushed In: ${factScans.map(_.dataFilters)}")
    // a NON-equi condition skips the prune but stays correct
    val ne = jspec.copy(joinDims = Seq(
      MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k AND 1 = 1")))
    assert(ne.joinDims.head.equiKeys.isEmpty)
    val affectedNe = MvSync.dimChangeAffectedGroups(fact, ne, images,
      0, wm, until, Seq(pinned), maxPruneGroups = 100)
    assert(affectedNe.collect().map(_.getString(0)).toSet == Set("A", "B", "Z"))
  }

  test("multi-dim star join: fact-only incremental, one-dim move partial, multi-dim move reseeds") {
    import graft.ice.IceTableConfig
    val fact = new IceTable(spark, tmpDir("mvmd_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val d1 = new IceTable(spark, tmpDir("mvmd_d1"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k1")))
    val d2 = new IceTable(spark, tmpDir("mvmd_d2"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k2")))
    d1.insert(Seq(("a", "A"), ("b", "B")).toDF("k1", "cat"))
    d2.insert(Seq(("x", "X"), ("y", "Y")).toDF("k2", "tier"))
    val mspec = MvSync.MvSpec(Seq("cat", "tier"), sumCols = Seq("f.v"),
      joinDims = Seq(
        MvSync.MvJoinDim("d1", "f", "da", "f.k1 = da.k1"),
        MvSync.MvJoinDim("d2", "f", "db", "f.k2 = db.k2")))
    val mv = MvSync.create(spark, tmpDir("mvmd_mv"), mspec)
    def oracle(): Set[(String, String, Long, Long)] =
      fact.read().alias("f")
        .join(d1.read().alias("da"), expr("f.k1 = da.k1"))
        .join(d2.read().alias("db"), expr("f.k2 = db.k2"))
        .groupBy("cat", "tier")
        .agg(count(lit(1)).as("cnt"), sum("f.v").as("s"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
    def got(): Set[(String, String, Long, Long)] =
      MvSync.read(mv, mspec).collect().map(r => (r.getString(0),
        r.getString(1), r.getLong(2), r.getLong(3))).toSet
    fact.insert(Seq((1L, "a", "x", 10L), (2L, "b", "x", 20L),
      (3L, "a", "y", 5L)).toDF("id", "k1", "k2", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, mspec, dimTables = Seq(d1, d2))
    assert(got() == oracle())
    // fact-only window: true IVM — partials, zero resets
    fact.insert(Seq((4L, "b", "y", 7L)).toDF("id", "k1", "k2", "v"))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(fact, mv, mspec, dimTables = Seq(d1, d2))
    assert(p1 == 1L && r1 == 0L)
    assert(got() == oracle())
    // ONE dim moves: partial maintenance. This spec is count/sum-only
    // AND the recorded log-count proves no straggler landed at the
    // boundary, so the window opens at exactly v0 and the move lands as
    // PURE SIGNED partials — the (A,*) negations and (C,*) credits,
    // zero resets, zero discovery; B's groups are never touched
    d1.updateWhere(col("k1") === "a", Seq("cat" -> lit("C")))
    settle()
    val (p2, r2) = MvSync.syncFromFeed(fact, mv, mspec, dimTables = Seq(d1, d2))
    assert(p2 == 4L && r2 == 0L, s"expected 4 signed rows, 0 resets, got ($p2, $r2)")
    assert(got() == oracle())
    // physical shape: no reset generation was appended for B's groups
    assert(mv.read().where(col("is_reset") && col("cat") === "B")
      .select("gen").distinct().count() == 1L) // the seed's only
    // BOTH dims move in one window: batch deltas cannot attribute —
    // full reseed (every live group a reset, incl. stale retractions)
    d1.updateWhere(col("k1") === "b", Seq("cat" -> lit("D")))
    d2.updateWhere(col("k2") === "x", Seq("tier" -> lit("Z")))
    settle()
    val (p3, r3) = MvSync.syncFromFeed(fact, mv, mspec, dimTables = Seq(d1, d2))
    assert(p3 == 0L && r3 >= 4L)
    assert(got() == oracle())
    // and the view keeps maintaining incrementally after
    fact.insert(Seq((5L, "a", "y", 3L)).toDF("id", "k1", "k2", "v"))
    settle()
    val (p4, r4) = MvSync.syncFromFeed(fact, mv, mspec, dimTables = Seq(d1, d2))
    assert(p4 == 1L && r4 == 0L)
    assert(got() == oracle())
  }

  test("signed dim maintenance: a count/sum join view absorbs dim moves with ZERO resets") {
    import graft.ice.{DeleteVectors, IceTableConfig}
    val fact = new IceTable(spark, tmpDir("mvsg_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvsg_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    // small second dim commit: the recorded version anchors here, so a
    // later move's window re-captures one dummy row, not the seed
    dim.insert(Seq(("zz", "Z")).toDF("k", "cat"))
    val sspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvsg_mv"), sspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, sspec, dimTables = Seq(dim))
    def rows() = MvSync.read(mv, sspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 1L, 5L), ("B", 1L, 9L)))
    // ONE dim move: count/sum has no extremum to recompute, so the move
    // lands as SIGNED partials — negate the old mapping, credit the new
    // — with ZERO resets and no affected-group discovery at all. The
    // emptied group folds to cnt 0 and vanishes under the read rule.
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("C")))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(fact, mv, sspec, dimTables = Seq(dim))
    assert(r1 == 0L, s"expected zero resets on the signed path, got ($p1, $r1)")
    assert(p1 == 2L) // the -A negation row and the +C credit row
    assert(rows() == Seq(("B", 1L, 9L), ("C", 1L, 5L)))
    // physical shape: no reset generation was appended for the move
    assert(mv.read().where(col("is_reset") && col("cat") === "C").isEmpty)
    // the nasty mix: a fact MoR delete AND a dim move in the SAME
    // window — the delete's group routes through the reset machinery,
    // whose recompute subsumes (and drops) that group's signed row
    DeleteVectors.deleteWhere(fact, col("id") === 2L)
    dim.updateWhere(col("k") === "k2", Seq("cat" -> lit("D")))
    settle()
    MvSync.syncFromFeed(fact, mv, sspec, dimTables = Seq(dim))
    assert(rows() == Seq(("C", 1L, 5L)))
    // and a later plain fact window keeps accumulating on top
    fact.insert(Seq((3L, "k1", 2L)).toDF("id", "k", "v"))
    settle()
    val (p3, r3) = MvSync.syncFromFeed(fact, mv, sspec, dimTables = Seq(dim))
    assert(p3 == 1L && r3 == 0L)
    assert(rows() == Seq(("C", 2L, 7L)))
  }

  test("signed dim maintenance follows a dim ATTRIBUTE change (sum over a dim column)") {
    import graft.ice.IceTableConfig
    val fact = new IceTable(spark, tmpDir("mvsa_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvsa_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", 100L), ("k2", 10L)).toDF("k", "x"))
    dim.insert(Seq(("zz", 0L)).toDF("k", "x"))
    // the aggregate reads the DIM side: avg divides by the non-null
    // count, so the signed path must maintain cnt_d_x too
    val aspec = MvSync.MvSpec(Seq("g"), sumCols = Seq("d.x"),
      countCols = Seq("d.x"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvsa_mv"), aspec)
    fact.insert(Seq((1L, "k1", "g1"), (2L, "k2", "g1"), (3L, "k1", "g2"))
      .toDF("id", "k", "g"))
    settle()
    MvSync.syncFromFeed(fact, mv, aspec, dimTables = Seq(dim))
    def rows() = MvSync.read(mv, aspec).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows() == Seq(("g1", 2L, 110L, 2L), ("g2", 1L, 100L, 1L)))
    // the dim VALUE changes but no group does: the negation and the
    // credit land in the SAME groups — net cnt 0, sum moves by the
    // value delta, still zero resets
    dim.updateWhere(col("k") === "k1", Seq("x" -> lit(7L)))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(fact, mv, aspec, dimTables = Seq(dim))
    assert(r1 == 0L)
    assert(rows() == Seq(("g1", 2L, 17L, 2L), ("g2", 1L, 7L, 1L)))
  }

  test("global (no GROUP BY) view reads exactly one row — including the empty edges") {
    val base = newBase()
    val vd = MvSync.MvViewDef("base", Nil, Seq(
      MvSync.MvOutput("cnt", "cnt", ""),
      MvSync.MvOutput("s", "sum", "v"),
      MvSync.MvOutput("mn", "min", "v")))
    val mv = MvSync.create(spark, tmpDir("mvsync_gmv"), vd.spec,
      viewDef = Some(vd))
    // seeded while the source has a schema but ZERO rows: the view must
    // read the aggregate identities (cnt 0), not no-rows
    base.insert(Seq((1L, "a", 10L)).toDF("id", "grp", "v"))
    base.deleteWhere(lit(true))
    settle()
    MvSync.syncFromFeed(base, mv, vd.spec)
    def row() = MvSync.readView(mv, vd).collect()
    val empty = row()
    assert(empty.length == 1 && empty.head.getLong(0) == 0L &&
      empty.head.isNullAt(1) && empty.head.isNullAt(2))
    // data arrives: partials accumulate under the synthetic key
    base.insert(Seq((2L, "a", 7L), (3L, "b", 3L)).toDF("id", "grp", "v"))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(base, mv, vd.spec)
    assert(p1 == 1L)
    val full = row()
    assert(full.length == 1 && full.head.getLong(0) == 2L &&
      full.head.getLong(1) == 10L && full.head.getLong(2) == 3L)
    // full retraction: back to the one identity row, never zero rows
    base.deleteWhere(lit(true))
    settle()
    MvSync.syncFromFeed(base, mv, vd.spec)
    val retracted = row()
    assert(retracted.length == 1 && retracted.head.getLong(0) == 0L &&
      retracted.head.isNullAt(1) && retracted.head.isNullAt(2))
  }

  test("streaming autoRebase: a dim move is absorbed in-stream, exactly-once") {
    import graft.ice.{ChangeFeed, IceTableConfig}
    val fact = new IceTable(spark, tmpDir("mvar_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvar_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvar_mv"), jspec)
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 5L)).toDF("id", "k", "v"))
    settle()
    val b1 = ChangeFeed.between(fact, 0L)
    MvSync.applyFeedBatch(fact, mv, jspec, b1, 1L, "qa",
      dimTables = Seq(dim), autoRebase = true)
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 1L, 10L), ("B", 1L, 5L)))
    // the dim moves AND facts land in the same stream window: the next
    // batch absorbs both as one reset generation — no failure, no stop
    val wm1 = b1.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("C")))
    settle()
    fact.insert(Seq((3L, "k2", 7L)).toDF("id", "k", "v"))
    settle()
    val b2 = ChangeFeed.between(fact, wm1).localCheckpoint(true)
    MvSync.applyFeedBatch(fact, mv, jspec, b2, 2L, "qa",
      dimTables = Seq(dim), autoRebase = true)
    // the reset at the batch's own bound covers the batch's fact insert
    // too (it is in the base as of gen + 1): B counts rows 2 and 3
    assert(rows() == Seq(("B", 2L, 12L), ("C", 1L, 10L)))
    // exactly-once: a crash-replay of the same batch changes nothing
    MvSync.applyFeedBatch(fact, mv, jspec, b2, 2L, "qa",
      dimTables = Seq(dim), autoRebase = true)
    assert(rows() == Seq(("B", 2L, 12L), ("C", 1L, 10L)))
    // later fact-only batches apply deltas on top of the absorbed state
    val wm2 = b2.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    fact.insert(Seq((4L, "k1", 4L)).toDF("id", "k", "v"))
    settle()
    val b3 = ChangeFeed.between(fact, wm2)
    MvSync.applyFeedBatch(fact, mv, jspec, b3, 3L, "qa",
      dimTables = Seq(dim), autoRebase = true)
    assert(rows() == Seq(("B", 2L, 12L), ("C", 2L, 14L)))
    b2.unpersist()
  }

  test("straggler-proof fallback: a wrong count mark degrades to the boundary window, never to a miss") {
    import graft.ice.{CdcApply, IceTableConfig}
    val fact = new IceTable(spark, tmpDir("mvfb_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvfb_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvfb_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    // poison the count mark with a DOMINATING value whose embedded
    // version doesn't pair with the recorded version mark (the torn-
    // pair / foreign-write shape; a low bogus value can't even land —
    // the mark channel max-merges, which is the encoding's point). The
    // self-pairing check must reject it and the window open 1 ms early
    // — the boundary re-captures route through the idempotent resets,
    // so the result is identical, just not signed-pure
    val v0 = dim.commitVersion()
    CdcApply.commitMark(mv, "_mv_dimn:default", ((v0 + 1L) << 20) | 2L)
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("C")))
    settle()
    val (p1, r1) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("B", 1L, 9L), ("C", 1L, 5L)))
    // the failed proof forced re-capture resets (boundary evidence)
    assert(r1 > 0L, s"expected boundary-window resets, got ($p1, $r1)")
    // the sync re-recorded a TRUE count: the next move runs signed-pure
    dim.updateWhere(col("k") === "k2", Seq("cat" -> lit("D")))
    settle()
    val (p2, r2) = MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(r2 == 0L && p2 == 2L, s"expected pure signed, got ($p2, $r2)")
    assert(rows() == Seq(("C", 1L, 5L), ("D", 1L, 9L)))
  }

  test("dim log consolidation between syncs stays correct (count mismatch degrades safely)") {
    import graft.ice.IceTableConfig
    val fact = new IceTable(spark, tmpDir("mvlc_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvlc_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A")).toDF("k", "cat"))
    dim.insert(Seq(("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvlc_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    // compaction consolidates the dim's two logs into one: version AND
    // count both move with zero row-level changes — the sync must read
    // "dim changed", find an empty (or unattributable) delta, and land
    // on a state identical to the truth
    dim.merge()
    Thread.sleep(5)
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 1L, 5L), ("B", 1L, 9L)))
    // and a real move right after the consolidation still maintains
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("Z")))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    assert(rows() == Seq(("B", 1L, 9L), ("Z", 1L, 5L)))
  }

  test("mvSyncSink autoRebase: the stream absorbs a dim move across restarts") {
    import graft.ice.IceTableConfig
    import org.apache.spark.sql.streaming.Trigger
    val fact = new IceTable(spark, tmpDir("mvsk_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvsk_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvsk_mv"), jspec)
    val ckpt = tmpDir("mvsk_ckpt")
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 5L)).toDF("id", "k", "v"))
    settle()
    val q1 = graft.streaming.Streams.mvSyncSink(fact, mv, jspec, ckpt,
      queryName = "qs", trigger = Trigger.AvailableNow(),
      dimTables = Seq(dim), autoRebase = true)
    q1.awaitTermination()
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 1L, 10L), ("B", 1L, 5L)))
    // the dim moves while the stream is down; the restarted sink's
    // first batch absorbs it instead of dying (autoRebase)
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("C")))
    settle()
    fact.insert(Seq((3L, "k2", 7L)).toDF("id", "k", "v"))
    settle()
    val q2 = graft.streaming.Streams.mvSyncSink(fact, mv, jspec, ckpt,
      queryName = "qs", trigger = Trigger.AvailableNow(),
      dimTables = Seq(dim), autoRebase = true)
    q2.awaitTermination()
    assert(rows() == Seq(("B", 2L, 12L), ("C", 1L, 10L)))
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
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvflaky_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L)).toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    // the dim-side MoR delete commits ONLY to `_dv`
    graft.ice.DeleteVectors.deleteWhere(dim, col("k") === "k2")
    settle()
    graft.ice.FlakyDvFileSystem.armFailure()
    intercept[java.io.IOException](
      MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim)))
    // the retry (blip gone) maintains against the TRUE dim state: k2's
    // group is retracted, never silently kept on the stale pin
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    val got = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 1L, 5L)))
  }

  test("autoRebase replay gate: a skipped duplicate batch never advances the dim marks") {
    // The divergence shape: batch 2's ORIGINAL delivery lands as a plain
    // fact delta; the stream crashes; the dim moves while it is down;
    // the restart REPLAYS batch 2 (same batchId). insertBatch skips the
    // duplicate — if the dim marks advanced anyway, the move would be
    // recorded as absorbed without any reset generation existing, and
    // every later delta would apply on stale partials forever. The gate:
    // marks stay put on a skipped insert, so the NEXT batch re-detects
    // the move and absorbs it (an extra absorb is idempotent).
    import graft.ice.{ChangeFeed, IceTableConfig}
    val fact = new IceTable(spark, tmpDir("mvrg_fact"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvrg_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvrg_mv"), jspec)
    fact.insert(Seq((1L, "k1", 10L), (2L, "k2", 5L)).toDF("id", "k", "v"))
    settle()
    val b1 = ChangeFeed.between(fact, 0L)
    val wm1 = b1.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    MvSync.applyFeedBatch(fact, mv, jspec, b1, 1L, "qrg",
      dimTables = Seq(dim), autoRebase = true)
    // batch 2: fact-only, lands as a plain delta
    fact.insert(Seq((3L, "k1", 7L)).toDF("id", "k", "v"))
    settle()
    val b2 = ChangeFeed.between(fact, wm1).localCheckpoint(true)
    MvSync.applyFeedBatch(fact, mv, jspec, b2, 2L, "qrg",
      dimTables = Seq(dim), autoRebase = true)
    def rows() = MvSync.read(mv, jspec).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("A", 2L, 17L), ("B", 1L, 5L)))
    // crash: the dim moves while the stream is down, then the restart
    // re-delivers batch 2 verbatim
    dim.updateWhere(col("k") === "k1", Seq("cat" -> lit("C")))
    settle()
    MvSync.applyFeedBatch(fact, mv, jspec, b2, 2L, "qrg",
      dimTables = Seq(dim), autoRebase = true)
    // the replayed insert was skipped: the move must NOT read as absorbed
    // — the next (fresh) batch re-detects it and lands the reset
    val wm2 = b2.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
    fact.insert(Seq((4L, "k2", 2L)).toDF("id", "k", "v"))
    settle()
    val b3 = ChangeFeed.between(fact, wm2)
    MvSync.applyFeedBatch(fact, mv, jspec, b3, 3L, "qrg",
      dimTables = Seq(dim), autoRebase = true)
    assert(rows() == Seq(("B", 2L, 7L), ("C", 2L, 17L)))
    b2.unpersist()
  }

  test("partial-maintenance degrades are surfaced, and the fallback still lands correct state") {
    // r14 verdict item #5: the dim-delta and key-prune fallbacks were
    // silent — at 100 TB a degrade is a 1000× cost cliff an operator
    // must be able to diagnose. The hook captures the reason; the
    // injected failure here is a delta larger than maxPruneGroups.
    import graft.ice.IceTableConfig
    val fact = new IceTable(spark, tmpDir("mvwf_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("mvwf_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B"), ("k3", "B")).toDF("k", "cat"))
    val jspec = MvSync.MvSpec(Seq("cat"), sumCols = Seq("f.v"),
      joinDims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("mvwf_mv"), jspec)
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L), (3L, "k3", 4L))
      .toDF("id", "k", "v"))
    settle()
    MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim))
    val captured = scala.collection.mutable.ArrayBuffer.empty[String]
    val saved = MvSync.onFallback
    MvSync.onFallback = m => captured.synchronized { captured += m; () }
    try {
      // a 2-key dim move against maxPruneGroups = 0: the delta is
      // "too large", the partial path is refused, the full reseed runs
      dim.updateWhere(col("k").isin("k1", "k2"), Seq("cat" -> lit("Z")))
      settle()
      MvSync.syncFromFeed(fact, mv, jspec, dimTables = Seq(dim),
        maxPruneGroups = 0)
      val got = MvSync.read(mv, jspec).orderBy("cat").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq(("B", 1L, 4L), ("Z", 2L, 14L)))
      val msgs = captured.synchronized { captured.toList }
      assert(msgs.exists(m => m.contains("maxPruneGroups") &&
        m.contains("full reseed")),
        s"expected a surfaced degrade reason, captured: $msgs")
    } finally MvSync.onFallback = saved
  }
}
