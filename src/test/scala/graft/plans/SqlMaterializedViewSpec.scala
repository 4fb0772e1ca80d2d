package graft.plans

import graft.SparkSpec
import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
import org.apache.spark.sql.functions._

/** The SQL face of incremental materialized views:
  * CREATE MATERIALIZED VIEW / REFRESH MATERIALIZED VIEW, catalog reads
  * resolving to the folded view, and the derived-state write guard. */
class SqlMaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String = {
    val w = tmpDir("graft_mv_wh")
    spark.conf.set(IceSqlResolution.WarehouseKey, w)
    w
  }

  private def seedBase(w: String, name: String): IceTable = {
    val t = new IceTable(spark, s"$w/$name", IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    t.insert(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "grp", "v"))
    t
  }

  private def settle(): Unit = Thread.sleep(5)

  test("CREATE seeds, SELECT folds, REFRESH follows insert/update/delete") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase1")
    settle()
    val seeded = spark.sql(
      """CREATE MATERIALIZED VIEW graft.mv1 AS
        |SELECT grp, count(*) AS cnt, sum(v) AS total, min(v) AS lo,
        |       max(v) AS hi, avg(v) AS mean
        |FROM graft.mvbase1 GROUP BY grp""".stripMargin).head.getLong(0)
    assert(seeded == 2L)
    def viewRows() = spark.sql(
      "SELECT grp, cnt, total, lo, hi, mean FROM graft.mv1 ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(viewRows() == Seq(("a", 2L, 30L, 10L, 20L, 15.0), ("b", 1L, 5L, 5L, 5L, 5.0)))
    // mutate the base three ways, refresh once
    base.insert(Seq((4L, "b", 7L)).toDF("id", "grp", "v"))
    base.updateWhere(col("id") === 2L, Seq("v" -> lit(100L)))
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    settle()
    val r = spark.sql("REFRESH MATERIALIZED VIEW graft.mv1").head
    assert(r.getLong(1) >= 1L) // at least group a reset (update + delete)
    assert(viewRows() == Seq(("a", 1L, 100L, 100L, 100L, 100.0),
      ("b", 2L, 12L, 5L, 7L, 6.0)))
    // the view must agree with a fresh aggregation of the base, always
    val truth = spark.sql(
      """SELECT grp, count(*) AS cnt, sum(v) AS total, min(v) AS lo,
        |       max(v) AS hi, avg(v) AS mean
        |FROM graft.mvbase1 GROUP BY grp ORDER BY grp""".stripMargin).collect().toSeq
    assert(spark.sql(
      "SELECT grp, cnt, total, lo, hi, mean FROM graft.mv1 ORDER BY grp")
      .collect().toSeq == truth)
  }

  test("avg over a nullable column divides by the NON-NULL count") {
    val w = freshWarehouse()
    val t = new IceTable(spark, s"$w/mvnull", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    t.insert(Seq((1L, "a", Some(10L)), (2L, "a", None),
      (3L, "a", Some(20L)), (4L, "b", None)).toDF("id", "grp", "v"))
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mvnull_v AS
      SELECT grp, count(*) AS cnt, avg(v) AS mean
      FROM graft.mvnull GROUP BY grp""")
    val truth = spark.sql(
      "SELECT grp, count(*) AS cnt, avg(v) AS mean FROM graft.mvnull " +
        "GROUP BY grp ORDER BY grp").collect().toSeq
    val got = spark.sql(
      "SELECT grp, cnt, mean FROM graft.mvnull_v ORDER BY grp").collect().toSeq
    assert(got == truth) // a: 15.0 over TWO non-null rows; b: null, not 0/1
    assert(got.head.getDouble(2) == 15.0 && got(1).isNullAt(2))
    // and the incremental path keeps the invariant: retract the null row
    DeleteVectors.deleteWhere(t, col("id") === 2L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mvnull_v")
    assert(spark.sql("SELECT mean FROM graft.mvnull_v WHERE grp = 'a'")
      .head.getDouble(0) == 15.0)
  }

  test("count(DISTINCT) maintains as HLL state: union on insert, reset on delete, exact at small cardinality") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvdbase")
    settle()
    val seeded = spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvd AS
        |SELECT grp, count(*) AS cnt, count(DISTINCT v) AS uniq
        |FROM graft.mvdbase GROUP BY grp""".stripMargin).head.getLong(0)
    assert(seeded == 2L)
    def viewRows() = spark.sql(
      "SELECT grp, cnt, uniq FROM graft.mvd ORDER BY grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viewRows() == Seq(("a", 2L, 2L), ("b", 1L, 1L)))
    // insert-only window: sketches UNION (v=10 repeats in 'a' — distinct
    // must not double-count; 'b' gains a new value)
    base.insert(Seq((4L, "a", 10L), (5L, "b", 7L), (6L, "b", 7L))
      .toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mvd").collect()
    assert(viewRows() == Seq(("a", 3L, 2L), ("b", 3L, 2L)))
    // delete the only row carrying v=20 from 'a': a sketch cannot
    // subtract, so the group must RESET — recomputed exactly
    DeleteVectors.deleteWhere(base, col("id") === 2L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mvd").collect()
    assert(viewRows() == Seq(("a", 2L, 1L), ("b", 3L, 2L)))
    // compaction folds the binary state within cells; read unchanged
    spark.sql("OPTIMIZE graft.mvd").collect()
    assert(viewRows() == Seq(("a", 2L, 1L), ("b", 3L, 2L)))
    // the foreign-engine export refuses: HLL binaries don't fold outside
    val mv = IceTable.open(spark, s"$w/mvd")
    val e = intercept[UnsupportedOperationException](
      graft.ice.ManifestExport.writeDuckDbView(mv, s"$w/mvd/_e.sql", "x"))
    assert(e.getMessage.contains("HLL"))
    // only count supports DISTINCT
    val e2 = intercept[UnsupportedOperationException](spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvd2 AS
        |SELECT grp, sum(DISTINCT v) AS s FROM graft.mvdbase GROUP BY grp"""
        .stripMargin))
    assert(e2.getMessage.contains("count(DISTINCT"))
  }

  test("WHERE + expression group keys: filter follows DML, derived key moves rows across groups") {
    val w = freshWarehouse()
    val base = new IceTable(spark, s"$w/mvwbase", IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    base.insert(Seq((1L, "a", 10L), (2L, "a", 21L), (3L, "b", 5L),
      (4L, "skip", 7L)).toDF("id", "grp", "v"))
    settle()
    val seeded = spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvw AS
        |SELECT pmod(v, 2) AS parity, count(*) AS cnt, sum(v) AS total
        |FROM graft.mvwbase WHERE grp <> 'skip'
        |GROUP BY pmod(v, 2)""".stripMargin).head.getLong(0)
    assert(seeded == 2L) // (4, 'skip', 7) filtered out of the seed
    def viewRows() = spark.sql(
      "SELECT parity, cnt, total FROM graft.mvw ORDER BY parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viewRows() == Seq((0L, 1L, 10L), (1L, 2L, 26L)))
    // append: one filtered row, one landing in parity 1
    base.insert(Seq((5L, "c", 9L), (6L, "skip", 100L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mvw").collect()
    assert(viewRows() == Seq((0L, 1L, 10L), (1L, 3L, 35L)))
    // an UPDATE that moves a row ACROSS the filter boundary: (2, a, 21)
    // becomes grp='skip' → its delete image passed the filter (retracts
    // parity 1), its insert image does not (never lands)
    base.updateWhere(col("id") === 2L, Seq("grp" -> lit("skip")))
    // and one that changes the DERIVED KEY: v 10 → 11 moves parity 0 → 1
    base.updateWhere(col("id") === 1L, Seq("v" -> lit(11L)))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mvw").collect()
    // parity 0 is now empty → dropped; parity 1 holds v ∈ {5, 9, 11}
    assert(viewRows() == Seq((1L, 3L, 25L)))
    // MoR delete under the filter: row 3 (v=5, parity 1) retracts
    DeleteVectors.deleteWhere(base, col("id") === 3L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mvw").collect()
    assert(viewRows() == Seq((1L, 2L, 20L)))
    // the definition round-trips through the persisted config word
    val vd = graft.operators.MvSync.MvViewDef.decode(
      IceTable.open(spark, s"$w/mvw").cfg.mvDef.get)
    assert(vd.filterSql.exists(_.contains("skip")))
    assert(vd.groupExprs.map(_._1) == Seq("parity"))
    // a GROUP BY expression missing from the SELECT list fails at parse
    val e = intercept[UnsupportedOperationException](spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvw2 AS
        |SELECT count(*) AS cnt FROM graft.mvwbase GROUP BY pmod(v, 2)"""
        .stripMargin))
    assert(e.getMessage.contains("aliased"))
    // an alias shadowing a real source column is rejected at create time
    val e2 = intercept[UnsupportedOperationException](spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvw3 AS
        |SELECT pmod(v, 2) AS grp, count(*) AS cnt
        |FROM graft.mvwbase GROUP BY pmod(v, 2)""".stripMargin))
    assert(e2.getMessage.contains("shadows"))
  }

  test("star-join view: fact deltas join the pinned dim; dim changes trigger a full reseed") {
    val w = freshWarehouse()
    val fact = new IceTable(spark, s"$w/jf", IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    fact.insert(Seq((1L, "k1", 10L), (2L, "k1", 20L), (3L, "k2", 5L),
      (4L, "kX", 100L), (6L, "k3", 50L)).toDF("id", "k", "v")) // kX: no dim row
    val dim = new IceTable(spark, s"$w/jd", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B"), ("k3", "C")).toDF("k", "cat"))
    settle()
    val seeded = spark.sql(
      """CREATE MATERIALIZED VIEW graft.jmv AS
        |SELECT d.cat AS cat, count(*) AS cnt, sum(f.v) AS total
        |FROM graft.jf f JOIN graft.jd d ON f.k = d.k
        |GROUP BY d.cat""".stripMargin).head.getLong(0)
    assert(seeded == 3L) // kX dropped by the inner join
    def viewRows() = spark.sql(
      "SELECT cat, cnt, total FROM graft.jmv ORDER BY cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viewRows() == Seq(("A", 2L, 30L), ("B", 1L, 5L), ("C", 1L, 50L)))
    // fact-only delta: the feed window joins the pinned dim — no reseed
    fact.insert(Seq((5L, "k2", 7L)).toDF("id", "k", "v"))
    settle()
    val Seq(p1, r1) = spark.sql("REFRESH MATERIALIZED VIEW graft.jmv")
      .head.toSeq.map(_.asInstanceOf[Long])
    assert(p1 == 1L && r1 == 0L) // one partial, zero resets: true IVM
    assert(viewRows() == Seq(("A", 2L, 30L), ("B", 2L, 12L), ("C", 1L, 50L)))
    // a CoW update moving a fact row ACROSS dims: delete image joins on
    // the old key (retracts A), insert image on the new (lands in B)
    fact.updateWhere(col("id") === 2L, Seq("k" -> lit("k2")))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.jmv").collect()
    assert(viewRows() == Seq(("A", 1L, 10L), ("B", 3L, 32L), ("C", 1L, 50L)))
    // DIM insert: kX now resolves — the dim's change feed drives PARTIAL
    // maintenance (this first window re-captures the dim's own seed
    // commit at the recorded version — over-capture is idempotent, so
    // only correctness is asserted here; sharpness is asserted on the
    // next change, whose window holds just the small deltas)
    dim.insert(Seq(("kX", "A")).toDF("k", "cat"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.jmv").collect()
    assert(viewRows() == Seq(("A", 2L, 110L), ("B", 3L, 32L), ("C", 1L, 50L)))
    // DIM update: k2 moves from B to A. This count/sum view is
    // self-maintainable and the recorded log-count proves the window
    // boundary clean, so the move lands as PURE SIGNED partials — B's
    // negation folds the emptied group to cnt 0 (it vanishes with no
    // explicit reset) and A's credit row accumulates. Zero resets, no
    // discovery; C is NEVER touched: dim-change cost is
    // changed-keys-sized
    dim.updateWhere(col("k") === "k2", Seq("cat" -> lit("A")))
    settle()
    val Seq(p2b, r2b) = spark.sql("REFRESH MATERIALIZED VIEW graft.jmv")
      .head.toSeq.map(_.asInstanceOf[Long])
    assert(p2b == 2L && r2b == 0L, s"got ($p2b, $r2b)") // -B and +A signed rows
    assert(viewRows() == Seq(("A", 5L, 142L), ("C", 1L, 50L)))
    // dim-side MERGE-ON-READ delete: commits only to the dim's _dv side
    // log — the full commit version (main + dv) still detects it, the
    // delete image retracts group C, and its facts leave the view
    DeleteVectors.deleteWhere(dim, col("k") === "k3")
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.jmv").collect()
    assert(viewRows() == Seq(("A", 5L, 142L)))
    // idle refresh after: no reseed, no partials
    val Seq(p3, r3) = spark.sql("REFRESH MATERIALIZED VIEW graft.jmv")
      .head.toSeq.map(_.asInstanceOf[Long])
    assert(p3 == 0L && r3 == 0L)
    // the definition round-trips: reopened handle knows the join
    val vd = graft.operators.MvSync.MvViewDef.decode(
      IceTable.open(spark, s"$w/jmv").cfg.mvDef.get)
    assert(vd.dims.exists(j => j.dimTable == "jd" && j.factAlias == "f"))
    // RIGHT/FULL outer joins have no maintainable fact side — refused;
    // LEFT is first-class (null-extended facts, see the left-join test)
    val e = intercept[UnsupportedOperationException](spark.sql(
      """CREATE MATERIALIZED VIEW graft.jmv2 AS
        |SELECT d.cat AS cat, count(*) AS cnt
        |FROM graft.jf f RIGHT JOIN graft.jd d ON f.k = d.k
        |GROUP BY d.cat""".stripMargin))
    assert(e.getMessage.contains("INNER or LEFT"))
  }

  test("LEFT JOIN view: unmatched facts null-extend, a dim arrival moves them, SHOW CREATE round-trips") {
    val w = freshWarehouse()
    val fact = seedBase(w, "ljf")
    fact.insert(Seq((4L, "c", 7L)).toDF("id", "grp", "v"))
    val dim = new IceTable(spark, s"$w/ljd", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    // grp values a/b/c on the fact; only a and b get dim rows — the c
    // facts null-extend
    dim.insert(Seq(("a", "A"), ("b", "B")).toDF("k", "cat"))
    settle()
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.ljmv AS
        |SELECT d.cat AS cat, count(*) AS cnt, sum(f.v) AS sum_v
        |FROM graft.ljf f LEFT JOIN graft.ljd d ON f.grp = d.k
        |GROUP BY d.cat""".stripMargin).collect()
    def rows(): Map[Option[String], (Long, Long)] =
      spark.sql("SELECT cat, cnt, CAST(sum_v AS BIGINT) AS sum_v FROM graft.ljmv")
        .collect()
        .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    def oracle(): Map[Option[String], (Long, Long)] =
      IceTable.open(spark, s"$w/ljf").read().alias("f")
        .join(dim.read().alias("d"), expr("f.grp = d.k"), "left")
        .groupBy(col("cat"))
        .agg(count(lit(1)).as("cnt"), sum(col("f.v")).as("sum_v"))
        .collect()
        .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows() == oracle())
    assert(rows().contains(None), "grp=c facts must null-extend")
    // dim arrival: c gains a row — the null group's facts move into 'C'
    dim.insert(Seq(("c", "C")).toDF("k", "cat"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.ljmv").collect()
    assert(rows() == oracle())
    assert(!rows().contains(None), "emptied null group must fold out")
    // SHOW CREATE renders the LEFT JOIN and re-executes
    val stmt = spark.sql("SHOW CREATE TABLE graft.ljmv").head.getString(0)
    assert(stmt.contains("LEFT JOIN"), stmt)
    spark.sql("DROP MATERIALIZED VIEW graft.ljmv").collect()
    spark.sql(stmt.split("\n").filterNot(_.trim.startsWith("--")).mkString("\n"))
      .collect()
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.ljmv").collect()
    assert(rows() == oracle())
  }

  test("exact_count_distinct: SQL views serve the exact retractable distinct through DML") {
    val w = freshWarehouse()
    val base = seedBase(w, "xdbase") // (1,a,10),(2,a,20),(3,b,5)
    base.insert(Seq((4L, "a", 10L), (5L, "b", 5L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.xdmv AS
      SELECT grp, count(*) AS cnt, exact_count_distinct(v) AS uv
      FROM graft.xdbase GROUP BY grp""").collect()
    def rows() = spark.sql(
      "SELECT grp, cnt, uv FROM graft.xdmv ORDER BY grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def truth() = spark.sql(
      """SELECT grp, count(*) AS cnt, count(DISTINCT v) AS uv
        |FROM graft.xdbase GROUP BY grp ORDER BY grp""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == truth() && rows() == Seq(("a", 3L, 2L), ("b", 2L, 1L)))
    // DML: dedup-surviving delete, true retraction, update, insert
    DeleteVectors.deleteWhere(base, col("id") === 1L) // dup of v=10 stays
    base.deleteWhere(col("id") === 2L)                // last v=20 goes
    base.updateWhere(col("id") === 5L, Seq("v" -> lit(7L)))
    base.insert(Seq((6L, "b", 9L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.xdmv").collect()
    assert(rows() == truth())
    // SHOW CREATE round-trips the exact spelling
    val stmt = spark.sql("SHOW CREATE TABLE graft.xdmv").head.getString(0)
    assert(stmt.contains("exact_count_distinct(v)"), stmt)
    // the DuckDB export SERVES the exact distinct (the HLL spelling
    // refuses): side-table fold CTE + join present, all file lists real
    val sql = graft.ice.ManifestExport.duckDbViewSql(
      IceTable.open(spark, s"$w/xdmv"), "xd_view")
    assert(sql.contains("_xd_v") && sql.contains("\"xd_v\"") &&
      sql.contains("read_parquet"), s"export missing the side fold:\n$sql")
    // OPTIMIZE (= rebase) keeps exactness and flattens main + side
    spark.sql("OPTIMIZE graft.xdmv").collect()
    assert(rows() == truth())
    // exact_count_distinct over a GROUP column: the side key set is
    // unchanged (no duplicate group name) and the count is trivially 1
    // per live group — creatable AND refreshable
    spark.sql("""CREATE MATERIALIZED VIEW graft.xdgmv AS
      SELECT grp, count(*) AS c, exact_count_distinct(grp) AS ug
      FROM graft.xdbase GROUP BY grp""").collect()
    base.insert(Seq((7L, "c", 1L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.xdgmv").collect()
    val g = spark.sql("SELECT grp, ug FROM graft.xdgmv ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(g.map(_._2).forall(_ == 1L), s"got $g")
    assert(g.map(_._1) == Seq("a", "b", "c"))
    // its export must not emit a duplicated group column in the side
    // CTE (an ambiguous reference in DuckDB's binder)
    val gsql = graft.ice.ManifestExport.duckDbViewSql(
      IceTable.open(spark, s"$w/xdgmv"), "xdg_view")
    assert(!gsql.contains("\"grp\", \"grp\""), s"duplicate column:\n$gsql")
    // a QUALIFIED exact-distinct arg whose sanitized name collides with
    // a real group column refuses loudly (silent mis-keying would be
    // wrong counts); only the unqualified self-reference folds in
    intercept[IllegalArgumentException] {
      graft.operators.MvSync.xdSideSpec(graft.operators.MvSync.MvSpec(
        groupCols = Seq("f_v"), exactDistinctCols = Seq("f.v"),
        joinDims = Seq(graft.operators.MvSync.MvJoinDim(
          "dim", "f", "d", "f.k = d.k"))), "f.v")
    }
    // ALTER … DROP of the last output over an exact-distinct column
    // reclaims its side table (group × distinct-values-sized dead state
    // no rebase would ever visit again)
    val xdDir = new java.io.File(s"$w/xdmv/_xd/v")
    assert(xdDir.isDirectory, "side table must exist before the DROP")
    spark.sql("ALTER MATERIALIZED VIEW graft.xdmv DROP (uv)").collect()
    assert(!xdDir.exists, "orphaned side table must be reclaimed")
    // the narrowed view keeps serving and maintaining
    base.insert(Seq((8L, "b", 2L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.xdmv").collect()
    assert(spark.sql("SELECT grp, cnt FROM graft.xdmv ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      spark.sql("SELECT grp, count(*) AS cnt FROM graft.xdbase GROUP BY grp ORDER BY grp")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("OPTIMIZE on an MV rebases: generations collapse and the fold-free read re-arms") {
    val w = freshWarehouse()
    val base = seedBase(w, "optbase")
    settle()
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.optmv AS
        |SELECT grp, count(*) AS cnt, sum(v) AS total
        |FROM graft.optbase GROUP BY grp""".stripMargin).collect()
    // fragment the view: two delta windows (one with a retraction)
    base.insert(Seq((10L, "a", 1L), (11L, "c", 2L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.optmv").collect()
    DeleteVectors.deleteWhere(base, col("id") === 3L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.optmv").collect()
    val mv = IceTable.open(spark, s"$w/optmv")
    assert(mv.read().count() > 3L, "view must be fragmented before OPTIMIZE")
    // the delta-fragmented view's read needs the fold (Window node)
    def planOf(): String =
      spark.sql("SELECT grp, cnt, total FROM graft.optmv")
        .queryExecution.executedPlan.toString
    assert(planOf().contains("Window"), "fragmented view should fold")
    // OPTIMIZE = the view's real compaction: rebase, not a cell merge —
    // generations collapse AND the flat proof re-arms in the same pass
    val merged = spark.sql("OPTIMIZE graft.optmv").head.getLong(0)
    assert(merged > 0L)
    val after = planOf()
    assert(!after.contains("Window"),
      s"post-OPTIMIZE read must be fold-free, got:\n$after")
    // contents identical to a fresh aggregation of the base
    val truth = spark.sql(
      """SELECT grp, count(*) AS cnt, sum(v) AS total
        |FROM graft.optbase GROUP BY grp ORDER BY grp""".stripMargin)
      .collect().toSeq
    assert(spark.sql("SELECT grp, cnt, total FROM graft.optmv ORDER BY grp")
      .collect().toSeq == truth)
    // ZORDER on an MV is refused with guidance
    val e = intercept[IllegalArgumentException](
      spark.sql("OPTIMIZE graft.optmv ZORDER BY (cnt)").collect())
    assert(e.getMessage.contains("MATERIALIZED VIEW"))
  }

  test("global (no GROUP BY) view: one-row dashboard counts through DML, 0 when empty") {
    val w = freshWarehouse()
    val base = seedBase(w, "gbase")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.gmv AS
      SELECT count(*) AS cnt, sum(v) AS total, min(v) AS lo, max(v) AS hi
      FROM graft.gbase""").collect()
    def row() = spark.sql("SELECT cnt, total, lo, hi FROM graft.gmv").collect()
    assert(row().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))) == Seq((3L, 35L, 5L, 20L)))
    // insert + CoW update + MoR delete, one refresh
    base.insert(Seq((4L, "c", 50L)).toDF("id", "grp", "v"))
    base.updateWhere(col("id") === 1L, Seq("v" -> lit(11L)))
    DeleteVectors.deleteWhere(base, col("id") === 3L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.gmv").collect()
    val truth = spark.sql("""SELECT count(*) AS cnt, sum(v) AS total,
      min(v) AS lo, max(v) AS hi FROM graft.gbase""").collect().toSeq
    assert(row().toSeq == truth)
    // the empty edge: full deletion reads as cnt 0, never no-rows
    base.deleteWhere(lit(true))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.gmv").collect()
    val e = row()
    assert(e.length == 1 && e.head.getLong(0) == 0L && e.head.isNullAt(1))
    // SHOW CREATE round-trips with no GROUP BY clause
    val stmt = spark.sql("SHOW CREATE TABLE graft.gmv").head.getString(0)
    assert(!stmt.contains("GROUP BY"))
    spark.sql("DROP MATERIALIZED VIEW graft.gmv").collect()
    spark.sql(stmt).collect()
    assert(row().length == 1 && row().head.getLong(0) == 0L)
  }

  test("HAVING compiles to a read-side filter over the folded view") {
    val w = freshWarehouse()
    val base = seedBase(w, "hbase")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.hmv AS
      SELECT grp, count(*) AS cnt, sum(v) AS total
      FROM graft.hbase GROUP BY grp HAVING count(*) > 1""").collect()
    def rows() = spark.sql(
      "SELECT grp, cnt, total FROM graft.hmv ORDER BY grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("a", 2L, 30L))) // b has cnt 1 → filtered at read
    // maintenance is HAVING-agnostic: b's second row makes it appear
    base.insert(Seq((9L, "b", 9L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.hmv").collect()
    assert(rows() == Seq(("a", 2L, 30L), ("b", 2L, 14L)))
    // SHOW CREATE carries the HAVING and re-executes
    val stmt = spark.sql("SHOW CREATE TABLE graft.hmv").head.getString(0)
    assert(stmt.contains("HAVING"))
    spark.sql("DROP MATERIALIZED VIEW graft.hmv").collect()
    spark.sql(stmt).collect()
    assert(rows() == Seq(("a", 2L, 30L), ("b", 2L, 14L)))
    // an aggregate HAVING references but doesn't SELECT is named loudly
    val e = intercept[Exception](spark.sql(
      """CREATE MATERIALIZED VIEW graft.hbad AS
        |SELECT grp, count(*) AS cnt FROM graft.hbase
        |GROUP BY grp HAVING sum(v) > 3""".stripMargin))
    assert(e.getMessage.contains("not in the SELECT list"))
  }

  test("approx_count_distinct is the honest spelling of the HLL-maintained distinct") {
    val w = freshWarehouse()
    seedBase(w, "adbase")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.admv AS
      SELECT grp, approx_count_distinct(v) AS uniq
      FROM graft.adbase GROUP BY grp""").collect()
    val got = spark.sql("SELECT grp, uniq FROM graft.admv ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L))) // sparse regime: exact
    // SHOW CREATE notes the estimate contract
    val stmt = spark.sql("SHOW CREATE TABLE graft.admv").head.getString(0)
    assert(stmt.contains("estimates"))
  }

  test("multi-dim star view: two JOINs, fact deltas incremental, dim moves maintained") {
    val w = freshWarehouse()
    val fact = new IceTable(spark, s"$w/jf2", IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    val d1 = new IceTable(spark, s"$w/je1", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k1")))
    val d2 = new IceTable(spark, s"$w/je2", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k2")))
    d1.insert(Seq(("a", "A"), ("b", "B")).toDF("k1", "cat"))
    d2.insert(Seq(("x", "X"), ("y", "Y")).toDF("k2", "tier"))
    fact.insert(Seq((1L, "a", "x", 10L), (2L, "b", "x", 20L),
      (3L, "a", "y", 5L)).toDF("id", "k1", "k2", "v"))
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mdmv AS
      SELECT da.cat AS cat, db.tier AS tier, count(*) AS cnt,
             sum(f.v) AS total
      FROM graft.jf2 f JOIN graft.je1 da ON f.k1 = da.k1
                       JOIN graft.je2 db ON f.k2 = db.k2
      GROUP BY da.cat, db.tier""").collect()
    def truth() = spark.sql("""SELECT da.cat AS cat, db.tier AS tier,
        count(*) AS cnt, sum(f.v) AS total
      FROM graft.jf2 f JOIN graft.je1 da ON f.k1 = da.k1
                       JOIN graft.je2 db ON f.k2 = db.k2
      GROUP BY da.cat, db.tier ORDER BY cat, tier""").collect().toSeq
    def got() = spark.sql(
      "SELECT cat, tier, cnt, total FROM graft.mdmv ORDER BY cat, tier")
      .collect().toSeq
    assert(got() == truth())
    // fact-only window: partials, zero resets — true IVM over 2 joins
    fact.insert(Seq((4L, "b", "y", 7L)).toDF("id", "k1", "k2", "v"))
    settle()
    val r1 = spark.sql("REFRESH MATERIALIZED VIEW graft.mdmv").head
    assert(r1.getLong(0) > 0L && r1.getLong(1) == 0L)
    assert(got() == truth())
    // one dim moves → partial maintenance; then both move → reseed
    d1.updateWhere(col("k1") === "a", Seq("cat" -> lit("C")))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mdmv").collect()
    assert(got() == truth())
    d1.updateWhere(col("k1") === "b", Seq("cat" -> lit("D")))
    d2.updateWhere(col("k2") === "x", Seq("tier" -> lit("Z")))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mdmv").collect()
    assert(got() == truth())
    // SHOW CREATE carries both joins and re-executes
    val stmt = spark.sql("SHOW CREATE TABLE graft.mdmv").head.getString(0)
    assert(stmt.contains("je1") && stmt.contains("je2"))
    spark.sql("DROP MATERIALIZED VIEW graft.mdmv").collect()
    spark.sql(stmt).collect()
    assert(got() == truth())
  }

  test("SHOW CREATE TABLE on an MV emits its round-trippable defining statement") {
    val w = freshWarehouse()
    val base = seedBase(w, "scbase")
    settle()
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.scmv AS
        |SELECT pmod(v, 2) AS parity, count(*) AS cnt, sum(v) AS total,
        |       count(DISTINCT v) AS uniq
        |FROM graft.scbase WHERE grp <> 'skip'
        |GROUP BY pmod(v, 2)""".stripMargin).collect()
    val stmt = spark.sql("SHOW CREATE TABLE graft.scmv").head.getString(0)
    assert(stmt.startsWith("CREATE MATERIALIZED VIEW"))
    assert(stmt.contains("count(DISTINCT") && stmt.contains("WHERE"))
    val expected = spark.sql(
      "SELECT parity, cnt, total, uniq FROM graft.scmv ORDER BY parity")
      .collect().toSeq
    // the emitted statement RE-EXECUTES: drop, recreate, same contents
    spark.sql("DROP MATERIALIZED VIEW graft.scmv").collect()
    spark.sql(stmt).collect()
    assert(spark.sql(
      "SELECT parity, cnt, total, uniq FROM graft.scmv ORDER BY parity")
      .collect().toSeq == expected)
  }

  test("direct DML on a materialized view is rejected loudly") {
    val w = freshWarehouse()
    seedBase(w, "mvbase2")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv2 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase2 GROUP BY grp""")
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO graft.mv2 VALUES ('x', 1)")
    }
    assert(e1.getMessage.contains("MATERIALIZED VIEW"))
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM graft.mv2 WHERE cnt = 1")
    }
    assert(e2.getMessage.contains("MATERIALIZED VIEW"))
    // the API-level sync keeps working against the SQL-created view
    val mv = IceTable.open(spark, s"$w/mv2")
    assert(mv.cfg.mvDef.isDefined)
  }

  test("unsupported definitions fail at parse time with a reason") {
    freshWarehouse()
    def rejects(q: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(q))
      assert(e.getMessage.contains(needle), s"$q → ${e.getMessage}")
    }
    // count(DISTINCT col) is supported (HLL state); other DISTINCT
    // aggregates and expression args are not
    rejects("CREATE MATERIALIZED VIEW graft.m AS SELECT grp, avg(DISTINCT v) AS c FROM graft.t GROUP BY grp",
      "count(DISTINCT")
    rejects("CREATE MATERIALIZED VIEW graft.m AS SELECT grp, count(DISTINCT v + 1) AS c FROM graft.t GROUP BY grp",
      "plain column")
    rejects("CREATE MATERIALIZED VIEW graft.m AS SELECT grp, count(*) FROM graft.t GROUP BY grp",
      "alias")
    rejects("CREATE MATERIALIZED VIEW graft.m AS SELECT grp, count(*) AS c FROM parquet.`/x` GROUP BY grp",
      "FROM must")
    rejects("CREATE MATERIALIZED VIEW graft.m AS SELECT grp FROM graft.t",
      "GROUP BY")
    rejects("CREATE MATERIALIZED VIEW graft.m AS SELECT grp, other, count(*) AS c FROM graft.t GROUP BY grp",
      "not in GROUP BY")
  }

  test("IF NOT EXISTS is a no-op on an existing view; re-create rejected") {
    val w = freshWarehouse()
    seedBase(w, "mvbase3")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv3 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase3 GROUP BY grp""")
    assert(spark.sql("""CREATE MATERIALIZED VIEW IF NOT EXISTS graft.mv3 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase3 GROUP BY grp""")
      .head.getLong(0) == 0L)
    intercept[Exception] {
      spark.sql("""CREATE MATERIALIZED VIEW graft.mv3 AS
        SELECT grp, count(*) AS cnt FROM graft.mvbase3 GROUP BY grp""")
    }
  }

  test("DROP MATERIALIZED VIEW removes the view like DROP TABLE") {
    val w = freshWarehouse()
    seedBase(w, "mvbase5")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv5 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase5 GROUP BY grp""")
    assert(spark.sql("SELECT count(*) FROM graft.mv5").head.getLong(0) == 2L)
    spark.sql("DROP MATERIALIZED VIEW graft.mv5")
    intercept[Exception](spark.sql("SELECT count(*) FROM graft.mv5").collect())
    // idempotent spelling parity with DROP TABLE
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS graft.mv5").collect()
  }

  test("time travel folds the view's own history") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase4")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv4 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase4 GROUP BY grp""")
    val tsAfterSeed = System.currentTimeMillis()
    Thread.sleep(5)
    base.insert(Seq((9L, "a", 1L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv4")
    assert(spark.sql("SELECT cnt FROM graft.mv4 WHERE grp = 'a'")
      .head.getLong(0) == 3L)
    assert(spark.sql(
      s"SELECT cnt FROM graft.mv4 TIMESTAMP AS OF $tsAfterSeed WHERE grp = 'a'")
      .head.getLong(0) == 2L)
  }

  test("ALTER MATERIALIZED VIEW … ADD widens the definition with ONE base scan; collisions and bad columns rejected") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase7") // (1,a,10),(2,a,20),(3,b,5)
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv7 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase7 GROUP BY grp""")
    // widen with three aggregate kinds at once (sum, avg, min): one
    // reseed carries the new columns; existing reads never break
    val r = spark.sql("""ALTER MATERIALIZED VIEW graft.mv7
      ADD (sum(v) AS total, avg(v) AS mean, min(id) AS lo)""").head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    def rows() = spark.sql(
      "SELECT grp, cnt, total, mean, lo FROM graft.mv7 ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(rows() == Seq(("a", 2L, 30L, 15.0, 1L), ("b", 1L, 5L, 5.0, 3L)))
    // maintenance follows the WIDENED definition incrementally
    base.insert(Seq((4L, "b", 7L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv7").collect()
    assert(rows() == Seq(("a", 2L, 30L, 15.0, 1L), ("b", 2L, 12L, 6.0, 3L)))
    // SHOW CREATE round-trips the widened definition
    val stmt = spark.sql("SHOW CREATE TABLE graft.mv7").head.getString(0)
    assert(stmt.contains("AS `total`") && stmt.contains("AS `mean`") &&
      stmt.contains("AS `lo`"), s"widened definition missing from:\n$stmt")
    // alias collisions (output or group column) are rejected loudly
    intercept[UnsupportedOperationException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv7 ADD (max(v) AS total)"))
    intercept[UnsupportedOperationException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv7 ADD (max(v) AS grp)"))
    // a missing source column fails the seed scan BEFORE anything
    // commits — the view keeps serving the last good definition
    intercept[Exception](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv7 ADD (sum(no_such_col) AS sn)"))
    assert(rows() == Seq(("a", 2L, 30L, 15.0, 1L), ("b", 2L, 12L, 6.0, 3L)))
    // plain tables are not ALTER MATERIALIZED VIEW targets
    intercept[IllegalArgumentException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mvbase7 ADD (count(*) AS c)"))
  }

  test("ALTER MATERIALIZED VIEW … DROP narrows in one config commit; rebase reclaims the dead state") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase9") // (1,a,10),(2,a,20),(3,b,5)
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv9 AS
      SELECT grp, count(*) AS cnt, sum(v) AS total, avg(v) AS mean,
             min(id) AS lo
      FROM graft.mvbase9 GROUP BY grp""")
    val logsBefore = IceTable.open(spark, s"$w/mv9").history().count()
    // DROP two outputs: pure projection — ONE config commit, no reseed
    val r = spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv9 DROP (mean, lo)").head
    assert(r.getLong(0) == 2L)
    val logsAfter = IceTable.open(spark, s"$w/mv9").history().count()
    assert(logsAfter == logsBefore + 1, "DROP must be one config commit")
    // reads are correct immediately, serving the narrowed projection
    def rows() = spark.sql(
      "SELECT grp, cnt, CAST(total AS BIGINT) AS total FROM graft.mv9 ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows() == Seq(("a", 2L, 30L), ("b", 1L, 5L)))
    intercept[Exception](spark.sql("SELECT mean FROM graft.mv9").collect())
    // shared state survived: total (sum) still maintained though avg —
    // which shared sum_v — was dropped; maintenance continues narrowed
    base.insert(Seq((4L, "b", 7L)).toDF("id", "grp", "v"))
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv9").collect()
    assert(rows() == Seq(("a", 1L, 20L), ("b", 2L, 12L)))
    // SHOW CREATE round-trips the NARROWED definition
    val stmt = spark.sql("SHOW CREATE TABLE graft.mv9").head.getString(0)
    assert(stmt.contains("AS `total`") && !stmt.contains("AS `mean`") &&
      !stmt.contains("AS `lo`"), s"narrowed definition wrong:\n$stmt")
    // the next rebase physically reclaims the dead state columns: no
    // alive file carries min_id / cnt_v after OPTIMIZE (= rebase on MVs)
    spark.sql("OPTIMIZE graft.mv9").collect()
    val mv = IceTable.open(spark, s"$w/mv9")
    val fileCols = spark.read.parquet(
      mv.snapshot().aliveFiles.map(m => s"${mv.root}/${m.path}"): _*).columns.toSet
    assert(!fileCols.contains("min_id") && !fileCols.contains("cnt_v"),
      s"dead state must be reclaimed by the rebase, files carry: $fileCols")
    assert(fileCols.contains("sum_v"), "shared sum state must survive")
    assert(rows() == Seq(("a", 1L, 20L), ("b", 2L, 12L)))
    // refusals: group column, unknown alias, last output, HAVING ref
    intercept[UnsupportedOperationException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv9 DROP (grp)"))
    intercept[IllegalArgumentException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv9 DROP (no_such)"))
    intercept[UnsupportedOperationException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv9 DROP (cnt, total)"))
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv9h AS
      SELECT grp, count(*) AS cnt, sum(v) AS total
      FROM graft.mvbase9 GROUP BY grp HAVING sum(v) > 1""")
    val eh = intercept[UnsupportedOperationException](spark.sql(
      "ALTER MATERIALIZED VIEW graft.mv9h DROP (total)"))
    assert(eh.getMessage.contains("HAVING"))
  }

  test("ALTER … ADD on a GLOBAL view and with count(DISTINCT) — the synthetic key and HLL state evolve too") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase8") // (1,a,10),(2,a,20),(3,b,5)
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv8 AS
      SELECT count(*) AS cnt FROM graft.mvbase8""")
    val r = spark.sql("""ALTER MATERIALIZED VIEW graft.mv8
      ADD (sum(v) AS total, count(DISTINCT grp) AS groups)""").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L) // one synthetic group
    def row() = spark.sql(
      "SELECT cnt, total, groups FROM graft.mv8").head
    assert(row().getLong(0) == 3L && row().getLong(1) == 35L &&
      row().getLong(2) == 2L)
    // the widened global view still reads ONE row after full retraction
    base.deleteWhere(lit(true))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv8").collect()
    val empty = row()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) &&
      empty.getLong(2) == 0L)
    // the added HLL column makes the DuckDB export refuse, like CREATE's
    val mvT = IceTable.open(spark, s"$w/mv8")
    val ex = intercept[UnsupportedOperationException](
      graft.ice.ManifestExport.duckDbViewSql(mvT, "gv8"))
    assert(ex.getMessage.contains("HLL"))
  }

  test("RESTORE TABLE on a materialized view is refused — derived state cannot rewind") {
    // max-merged sync watermarks cannot be lowered, so an in-place
    // restore would claim later windows applied and silently diverge —
    // and revived pre-rebase markers would sit below a surviving
    // flat-state mark, falsely proving the fold-free read over raw
    // multi-generation partials
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase9")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv9 AS
      SELECT grp, count(*) AS cnt FROM graft.mvbase9 GROUP BY grp""")
    val preTs = System.currentTimeMillis()
    Thread.sleep(5)
    base.insert(Seq((4L, "b", 7L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv9 FULL").collect()
    val ex = intercept[Exception](spark.sql(
      s"RESTORE TABLE graft.mv9 TO TIMESTAMP AS OF $preTs").collect())
    assert(ex.getMessage.contains("MATERIALIZED VIEW"),
      s"expected the MV-restore refusal, got: ${ex.getMessage}")
    // the view is untouched and still serves the current folded state
    assert(spark.sql("SELECT cnt FROM graft.mv9 WHERE grp = 'b'")
      .head.getLong(0) == 2L)
    // …and the base itself remains restorable (the recipe the error names)
    spark.sql(s"RESTORE TABLE graft.mvbase9 TO TIMESTAMP AS OF $preTs").collect()
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv9").collect()
    assert(spark.sql("SELECT cnt FROM graft.mv9 WHERE grp = 'b'")
      .head.getLong(0) == 1L)
  }

  test("REFRESH … FULL rebases: generations collapse, the read goes fold-free, later windows still apply") {
    val w = freshWarehouse()
    val base = seedBase(w, "mvbase6")
    settle()
    spark.sql("""CREATE MATERIALIZED VIEW graft.mv6 AS
      SELECT grp, count(*) AS cnt, sum(v) AS total FROM graft.mvbase6
      GROUP BY grp""")
    // fragment the view: two more windows, one with a retraction
    base.insert(Seq((4L, "b", 7L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv6").collect()
    DeleteVectors.deleteWhere(base, col("id") === 1L)
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv6").collect()
    def viewRows() = spark.sql(
      "SELECT grp, cnt, total FROM graft.mv6 ORDER BY grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val before = viewRows()
    assert(before == Seq(("a", 1L, 20L), ("b", 2L, 12L)))
    val mvT = IceTable.open(spark, s"$w/mv6")
    assert(mvT.read().select("gen").distinct().count() > 1L,
      "precondition: the view is fragmented across generations")
    // FULL = the generation-collapsing rebase, spelled in SQL
    val r = spark.sql("REFRESH MATERIALIZED VIEW graft.mv6 FULL").head
    assert(r.getLong(0) == 0L && r.getLong(1) == 2L)
    // superseded generations reclaimed: one all-reset generation remains
    assert(mvT.read().select("gen").distinct().count() == 1L)
    assert(mvT.read().where(!col("is_reset")).count() == 0L)
    // the folded read is UNCHANGED…
    assert(viewRows() == before)
    // …and fold-free: scan + projection, no Window node in the plan
    val plan = spark.sql("SELECT grp, cnt, total FROM graft.mv6")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"expected a fold-free post-rebase read, got:\n$plan")
    // incremental maintenance continues on top of the rebased state
    base.insert(Seq((5L, "c", 3L)).toDF("id", "grp", "v"))
    settle()
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv6").collect()
    assert(viewRows() == Seq(("a", 1L, 20L), ("b", 2L, 12L), ("c", 1L, 3L)))
  }
}
