package graft.plans

import graft.SparkSpec
import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
import org.apache.spark.sql.functions._

/** The injected DDL/maintenance parser surface: CREATE TABLE AS, DROP
  * TABLE, SHOW TABLES, OPTIMIZE, VACUUM on `graft.` names; everything
  * else must reach the stock parser untouched. */
class GraftSqlParserSpec extends SparkSpec {

  private def freshWarehouse(): String = {
    val w = tmpDir("graft_ddl_wh")
    spark.conf.set(IceSqlResolution.WarehouseKey, w)
    w
  }

  private def src() = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, i % 7, s"t${i % 3}")).toDF("id", "u", "kind")
  }

  test("CTAS creates, routes by PARTITIONED BY, sorts by SORTED BY, persists config") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src")
    val out = spark.sql(
      """CREATE TABLE graft.ctas1 PARTITIONED BY (concat('u=', u))
        |SORTED BY (id) AS SELECT * FROM ctas_spec_src""".stripMargin).collect()
    assert(out.head.getLong(0) === 100L)
    // read back through the catalog
    val n = spark.sql("SELECT count(*) AS c FROM graft.ctas1").head.getLong(0)
    assert(n === 100L)
    // partition routing: 7 u= dirs under _data
    val dirs = new java.io.File(s"$w/ctas1/_data").listFiles().filter(_.isDirectory)
    assert(dirs.map(_.getName).toSet === (0 until 7).map(i => s"u=$i").toSet)
    // the persisted config survives a reopen: sortOrder + partitionExpr
    val t = IceTable.open(spark, s"$w/ctas1")
    assert(t.cfg.sortOrder === Seq("id"))
    // inserting through the reopened handle routes to the same scheme
    import spark.implicits._
    t.insert(Seq((101L, 3, "t1")).toDF("id", "u", "kind"))
    assert(spark.sql("SELECT count(*) AS c FROM graft.ctas1").head.getLong(0) === 101L)
  }

  test("CTAS accepts SORTED BY before PARTITIONED BY (either clause order)") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src_rev")
    spark.sql(
      """CREATE TABLE graft.ctasrev SORTED BY (id)
        |PARTITIONED BY (concat('u=', u)) AS SELECT * FROM ctas_spec_src_rev"""
        .stripMargin).collect()
    val t = IceTable.open(spark, s"$w/ctasrev")
    assert(t.cfg.sortOrder === Seq("id"))
    assert(new java.io.File(s"$w/ctasrev/_data/u=3").isDirectory)
  }

  test("CTAS on an existing table throws; IF NOT EXISTS is a no-op") {
    freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src2")
    spark.sql("CREATE TABLE graft.ctas2 AS SELECT * FROM ctas_spec_src2").collect()
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ctas2 AS SELECT * FROM ctas_spec_src2").collect()
    }
    assert(e.getMessage.contains("already exists"))
    val out = spark.sql(
      "CREATE TABLE IF NOT EXISTS graft.ctas2 AS SELECT * FROM ctas_spec_src2")
      .collect()
    assert(out.head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.ctas2").head.getLong(0) === 100L)
  }

  test("declared-schema CREATE TABLE: empty typed table; inserts route and type-check") {
    val w = freshWarehouse()
    val out = spark.sql(
      """CREATE TABLE graft.decl (id BIGINT, u INT, kind STRING)
        |PARTITIONED BY (concat('u=', u)) SORTED BY (id)""".stripMargin).collect()
    assert(out.head.getLong(0) === 1L)
    // empty but queryable, with the declared schema visible
    assert(spark.sql("SELECT count(*) AS c FROM graft.decl").head.getLong(0) === 0L)
    assert(spark.sql("DESCRIBE graft.decl").collect().map(_.getString(0)).toSeq
      .containsSlice(Seq("id", "u", "kind")))
    // inserts route under the persisted partition scheme
    spark.sql("INSERT INTO graft.decl VALUES (1, 3, 't0')").collect()
    assert(new java.io.File(s"$w/decl/_data/u=3").isDirectory)
    assert(spark.sql("SELECT count(*) AS c FROM graft.decl").head.getLong(0) === 1L)
    // the declared type pins: a conflicting later insert fails pre-flight
    import spark.implicits._
    val t = IceTable.open(spark, s"$w/decl")
    intercept[Exception] {
      t.insert(Seq((1.5, 1, "k")).toDF("id", "u", "kind"))
    }
    // IF NOT EXISTS no-ops; plain re-create errors
    assert(spark.sql("CREATE TABLE IF NOT EXISTS graft.decl (id BIGINT)")
      .head.getLong(0) === 0L)
    intercept[Exception] { spark.sql("CREATE TABLE graft.decl (id BIGINT)").collect() }
    // declared list + AS is contradictory and rejected pointedly
    val e = intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE graft.declx (id INT) AS SELECT 1")
    }
    assert(e.getMessage.contains("CTAS"))
    // bare CREATE with neither form still gets the pointed error
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE graft.decly")
    }
    assert(e2.getMessage.contains("AS <query>"))
  }

  test("ALTER TABLE ADD COLUMNS evolves the union schema; old files read null") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("addcol_src")
    spark.sql("CREATE TABLE graft.addc AS SELECT * FROM addcol_src").collect()
    val out = spark.sql(
      "ALTER TABLE graft.addc ADD COLUMNS (score DOUBLE, tag STRING)").collect()
    assert(out.head.getString(0) === "score DOUBLE, tag VARCHAR")
    // every pre-evolution row reads the new columns as null
    assert(spark.sql("SELECT count(*) c FROM graft.addc WHERE score IS NULL")
      .head.getLong(0) === 100L)
    // bare single-column spelling
    spark.sql("ALTER TABLE graft.addc ADD COLUMN extra BIGINT").collect()
    assert(spark.sql("DESCRIBE graft.addc").collect().map(_.getString(0))
      .contains("extra"))
    // re-adding any existing column errors
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.addc ADD COLUMN id BIGINT").collect()
    }
    assert(e.getMessage.contains("already exists"))
    // the declared type pins future inserts (A20 pre-flight)
    import spark.implicits._
    val t = IceTable.open(spark, s"$w/addc")
    intercept[Exception] {
      t.insert(Seq((200L, 1, "t0", "not-a-double", "x", 1L))
        .toDF("id", "u", "kind", "score", "tag", "extra"))
    }
  }

  test("RESTORE TABLE rolls back to the as-of state; time travel sees both layouts") {
    val w = freshWarehouse()
    import spark.implicits._
    val t = new IceTable(spark, s"$w/rest", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    t.insert((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val ts1 = t.logio.currentLogFiles(t.root)
      .map(f => graft.ice.IceLogIO.logFileInfo(f)._1).max
    Thread.sleep(3)
    t.insert((11 to 15).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.updateWhere(col("id") === 3L, Seq("v" -> lit("changed")))
    DeleteVectors.deleteWhere(t, col("id") === 5L)
    val preTs = (t.logio.currentLogFiles(t.root) ++
      t.logio.currentLogFiles(DeleteVectors.dvTable(t).root))
      .map(f => graft.ice.IceLogIO.logFileInfo(f)._1).max
    Thread.sleep(3)
    val out = spark.sql(s"RESTORE TABLE graft.rest TO TIMESTAMP AS OF $ts1").head
    assert(out.getLong(0) > 0 || out.getLong(1) > 0) // revived/tombstoned
    assert(out.getLong(2) > 0) // the dv mark rolled back too
    // post-restore state == the as-of read, byte for byte
    val restored = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(restored === (1 to 10).map(i => (i.toLong, s"v$i")))
    assert(t.read().orderBy("id").collect().toSeq ===
      t.read(ts1 + 1).orderBy("id").collect().toSeq)
    // time travel to the pre-restore head still sees the mutated layout
    val pre = t.read(preTs + 1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(pre.length === 14) // 15 rows minus the MoR-deleted id=5
    assert(pre.contains((3L, "changed")) && !pre.exists(_._1 == 5L))
    // a second restore to the same bound is a no-op; VERSION spelling parses
    val again = spark.sql(s"RESTORE TABLE graft.rest TO VERSION AS OF $ts1").head
    assert(again.getLong(0) === 0L && again.getLong(1) === 0L)
    // restoring to before the first commit errors loudly
    intercept[Exception] {
      spark.sql("RESTORE TABLE graft.rest TO TIMESTAMP AS OF 1").collect()
    }
  }

  test("DROP TABLE removes the table; IF EXISTS tolerates absence") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src3")
    spark.sql("CREATE TABLE graft.dropme AS SELECT * FROM ctas_spec_src3").collect()
    assert(new java.io.File(s"$w/dropme/_log").isDirectory)
    spark.sql("DROP TABLE graft.dropme").collect()
    assert(!new java.io.File(s"$w/dropme").exists())
    intercept[Exception] { spark.sql("DROP TABLE graft.dropme").collect() }
    val out = spark.sql("DROP TABLE IF EXISTS graft.dropme").collect()
    assert(out.head.getLong(0) === 0L)
  }

  test("SHOW TABLES IN graft lists exactly the warehouse's ice tables") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src4")
    spark.sql("CREATE TABLE graft.show_a AS SELECT * FROM ctas_spec_src4").collect()
    spark.sql("CREATE TABLE graft.show_b AS SELECT * FROM ctas_spec_src4").collect()
    new java.io.File(s"$w/not_a_table").mkdirs() // no _log: must not list
    val rows = spark.sql("SHOW TABLES IN graft").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("graft", "show_a"), ("graft", "show_b")))
  }

  test("OPTIMIZE compacts through SQL; VACUUM RETAIN 0 HOURS reclaims; dv marks vacuumed") {
    val w = freshWarehouse()
    import spark.implicits._
    val t = new IceTable(spark, s"$w/maint", IceTableConfig(
      partitionExpr = concat(lit("u="), pmod(col("u"), lit(2))),
      sortOrder = Seq("id")))
    (0 until 3).foreach { i =>
      t.insert((1 to 20).map(j => (i * 100L + j, j % 4)).toDF("id", "u"))
    }
    val before = t.snapshot().aliveFiles.length
    assert(before === 6) // 3 commits x 2 partitions
    // a dv mark that optimize carries and vacuum then reclaims
    DeleteVectors.deleteWhere(t, col("id") === 1L)
    val merged = spark.sql("OPTIMIZE graft.maint").head.getLong(0)
    assert(merged >= 2) // one merge per partition at least
    val after = t.snapshot().aliveFiles.length
    assert(after < before)
    // contents identical minus the deleted row
    assert(t.read().count() === 59L)
    val v = spark.sql("VACUUM graft.maint RETAIN 0 HOURS").head
    assert(v.getLong(0) > 0) // logs consolidated
    // optimize rewrote every marked file, so vacuum dropped the stale mark
    assert(v.getLong(2) === 1L)
    assert(t.read().count() === 59L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.maint").head.getLong(0) === 59L)
  }

  test("OPTIMIZE ZORDER BY reclusters on the named dimensions; content identical") {
    val w = freshWarehouse()
    import spark.implicits._
    val t = new IceTable(spark, s"$w/zopt", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq.empty,
      statsColumns = Seq("x", "y")))
    val n = 32
    // two commits of row-major data: x-range pruning is useless pre-recluster
    val rows = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    t.insert(rows.filter(_._1 < n / 2).toDF("x", "y"))
    t.insert(rows.filter(_._1 >= n / 2).toDF("x", "y"))
    val parts = spark.sql("OPTIMIZE graft.zopt ZORDER BY (x, y)").head.getLong(0)
    assert(parts === 1L) // one ("all") partition reclustered
    assert(spark.sql("SELECT count(*) c FROM graft.zopt").head.getLong(0) === (n * n).toLong)
    assert(spark.sql("SELECT count(DISTINCT x || '-' || y) c FROM graft.zopt")
      .head.getLong(0) === (n * n).toLong)
    // rejects non-numeric and unknown dimensions loudly
    val t2 = new IceTable(spark, s"$w/zbad", IceTableConfig(lit("all"), Seq.empty))
    t2.insert(Seq((1L, "a")).toDF("x", "s"))
    val e1 = intercept[Exception] {
      spark.sql("OPTIMIZE graft.zbad ZORDER BY (s)").collect()
    }
    assert(e1.getMessage.contains("numeric"))
    val e2 = intercept[Exception] {
      spark.sql("OPTIMIZE graft.zbad ZORDER BY (nope)").collect()
    }
    assert(e2.getMessage.contains("not in the table schema"))
    // all-null and constant (incl. epoch-nanos-magnitude) dimensions are
    // tolerated as no-contribution constants, never NPEs or scaled errors
    val t3 = new IceTable(spark, s"$w/zedge", IceTableConfig(lit("all"), Seq.empty))
    t3.insert(Seq((1L, Some(1700000000000000000L)), (2L, Some(1700000000000000000L)),
      (3L, Option.empty[Long])).toDF("x", "ts"))
    val parts3 = spark.sql("OPTIMIZE graft.zedge ZORDER BY (ts, x)").head.getLong(0)
    assert(parts3 === 1L)
    assert(spark.sql("SELECT count(*) c FROM graft.zedge").head.getLong(0) === 3L)
  }

  test("ALTER TABLE SORTED BY persists; PARTITIONED BY evolves the layout atomically") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src6")
    spark.sql(
      """CREATE TABLE graft.alterme PARTITIONED BY (concat('u=', u))
        |AS SELECT * FROM ctas_spec_src6""".stripMargin).collect()
    // sort-order change is config-only: a later insert sorts by the new order
    spark.sql("ALTER TABLE graft.alterme SORTED BY (kind, id)").collect()
    assert(IceTable.open(spark, s"$w/alterme").cfg.sortOrder === Seq("kind", "id"))
    // partition evolution: one atomic rewrite; content identical, new dirs
    val files = spark.sql(
      "ALTER TABLE graft.alterme PARTITIONED BY (concat('k=', kind))")
      .head.getLong(0)
    assert(files > 0)
    val dirs = new java.io.File(s"$w/alterme/_data").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("k=")).toSet
    assert(dirs === Set("k=t0", "k=t1", "k=t2"))
    assert(spark.sql("SELECT count(*) c FROM graft.alterme").head.getLong(0) === 100L)
    // the evolved scheme + sort order persist through reopen
    val t = IceTable.open(spark, s"$w/alterme")
    assert(t.cfg.sortOrder === Seq("kind", "id"))
    import spark.implicits._
    t.insert(Seq((200L, 9, "t9")).toDF("id", "u", "kind"))
    assert(new java.io.File(s"$w/alterme/_data/k=t9").isDirectory,
      "post-evolution insert must route under the NEW scheme")
  }

  test("DESCRIBE TABLE and DESCRIBE HISTORY read the log, not a Spark catalog") {
    freshWarehouse()
    src().createOrReplaceTempView("ctas_spec_src5")
    spark.sql(
      """CREATE TABLE graft.descme PARTITIONED BY (concat('u=', u))
        |AS SELECT * FROM ctas_spec_src5""".stripMargin).collect()
    val cols = spark.sql("DESCRIBE graft.descme").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(cols.map(_._1).containsSlice(Seq("id", "u", "kind")))
    assert(cols.contains(("u", "partition (path-derived)")) ||
      cols.exists(c => c._2 != null && c._2.contains("partition")),
      s"partition column not surfaced: $cols")
    // one CTAS commit + one more insert = two history rows
    spark.sql("INSERT INTO graft.descme VALUES (200, 1, 't0')").collect()
    val hist = spark.sql("DESCRIBE HISTORY graft.descme").collect()
    assert(hist.length === 2)
    assert(hist.map(_.getInt(3)).sum >= 2, "files_added accumulates")
    // DESC alias works; unknown table errors
    assert(spark.sql("DESC graft.descme").collect().nonEmpty)
    intercept[Exception] { spark.sql("DESCRIBE HISTORY graft.missing").collect() }
  }

  test("non-graft SQL is untouched; OPTIMIZE on other names still errors in the delegate") {
    assert(spark.sql("SELECT 1 AS one").head.getInt(0) === 1)
    intercept[Exception] { spark.sql("OPTIMIZE some_other_table") }
  }

  test("SHOW CREATE TABLE round-trips: executing the statement reproduces the config") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("sct_src")
    spark.sql(
      """CREATE TABLE graft.sct1 PARTITIONED BY (concat('u=', pmod(u, 4)))
        |SORTED BY (id) AS SELECT * FROM sct_src""".stripMargin).collect()
    val stmt = spark.sql("SHOW CREATE TABLE graft.sct1").head.getString(0)
    assert(stmt.startsWith("CREATE TABLE graft.`sct1` ("), stmt)
    assert(stmt.contains("PARTITIONED BY (") && stmt.contains("SORTED BY (`id`)"),
      stmt)
    assert(stmt.contains("`id` BIGINT") && stmt.contains("`kind` STRING"), stmt)
    // round trip: the emitted statement recreates an equivalent table
    spark.sql(stmt.replace("graft.`sct1`", "graft.`sct2`")).collect()
    spark.sql("INSERT INTO graft.sct2 SELECT * FROM sct_src").collect()
    val t1 = IceTable.open(spark, s"$w/sct1")
    val t2 = IceTable.open(spark, s"$w/sct2")
    assert(t2.snapshot().tableConfig.flatMap(_.get("prt")) ===
      t1.snapshot().tableConfig.flatMap(_.get("prt")))
    assert(t2.snapshot().tableConfig.flatMap(_.get("srt")).map(_.toString) ===
      t1.snapshot().tableConfig.flatMap(_.get("srt")).map(_.toString))
    // identical routing: same partition directory set
    def parts(t: IceTable) = t.snapshot().aliveFiles
      .map(m => t.partitionOf(m.path)).toSet
    assert(parts(t2) === parts(t1))
    // non-DDL config surfaces as comment lines, loudly
    val mv = new IceTable(spark, s"$w/sct_mv", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Nil,
      customMergeSql = Some("select count(*) as c from source_files")))
    mv.insert(src().selectExpr("id"))
    val mvStmt = spark.sql("SHOW CREATE TABLE graft.sct_mv").head.getString(0)
    assert(mvStmt.contains("-- config: custom merge sql:"), mvStmt)
    // …and a statement CARRYING those comment lines still executes: the
    // parser strips `--` comments before recognition, so the emitted DDL
    // is re-executable verbatim (the round-trip contract), with the
    // commented config intentionally NOT re-applied — it's documentation
    spark.sql(mvStmt.replace("graft.`sct_mv`", "graft.`sct_mv2`")).collect()
    spark.sql("INSERT INTO graft.sct_mv2 SELECT id FROM sct_src").collect()
    val mv2 = IceTable.open(spark, s"$w/sct_mv2")
    assert(parts(mv2) === Set("all"))
    assert(mv2.snapshot().tableConfig.forall(!_.contains("mrg")))
    // dashes INSIDE string literals are data, not comments
    spark.sql(
      """CREATE TABLE graft.sctd PARTITIONED BY (concat('d--', pmod(id, 2)))
        |AS SELECT id FROM sct_src -- trailing note""".stripMargin).collect()
    assert(parts(IceTable.open(spark, s"$w/sctd")) === Set("d--0", "d--1"))
  }

  test("SQL branch WAP loop: CREATE / SHOW / PUBLISH / DROP BRANCH") {
    import spark.implicits._
    val w = freshWarehouse()
    src().createOrReplaceTempView("br_src")
    spark.sql(
      """CREATE TABLE graft.brt PARTITIONED BY (concat('u=', pmod(u, 4)))
        |AS SELECT * FROM br_src""".stripMargin).collect()
    spark.sql("ALTER TABLE graft.brt CREATE BRANCH audit").collect()
    assert(spark.sql("SHOW BRANCHES IN graft.brt")
      .as[String].collect().toSeq === Seq("audit"))
    // write through the branch API handle; main (via SQL) stays pinned
    val main = IceTable.open(spark, s"$w/brt")
    val b = graft.ice.Branch.open(main, "audit")
    b.insert((200 to 219).map(i => (i.toLong, i % 7, "new")).toDF("id", "u", "kind"))
    assert(spark.sql("SELECT count(*) AS c FROM graft.brt").head.getLong(0) === 100L)
    val pub = spark.sql("ALTER TABLE graft.brt PUBLISH BRANCH audit").head
    assert(pub.getLong(0) > 0L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.brt").head.getLong(0) === 120L)
    spark.sql("ALTER TABLE graft.brt DROP BRANCH audit").collect()
    assert(spark.sql("SHOW BRANCHES IN graft.brt").count() === 0L)
    // a typo'd DROP must fail loudly, not leave the real branch pinned
    val e = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE graft.brt DROP BRANCH audti").collect()
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("branch DML through SQL: INSERT/UPDATE/DELETE/MERGE on graft.`t@branch`") {
    import spark.implicits._
    freshWarehouse()
    src().createOrReplaceTempView("brdml_src")
    spark.sql(
      """CREATE TABLE graft.brd PARTITIONED BY (concat('u=', pmod(u, 4)))
        |AS SELECT * FROM brdml_src""".stripMargin).collect()
    spark.sql("ALTER TABLE graft.brd CREATE BRANCH wap").collect()

    // the full DML surface targets the branch; main stays pinned at 100
    assert(spark.sql("INSERT INTO graft.`brd@wap` " +
      "SELECT id + 1000, id % 7, 'new' FROM brdml_src WHERE id <= 10")
      .head.getLong(0) === 10L)
    assert(spark.sql("UPDATE graft.`brd@wap` SET kind = 'flag' WHERE id = 5")
      .head.getLong(0) === 1L)
    assert(spark.sql("DELETE FROM graft.`brd@wap` WHERE id >= 90 AND id < 100")
      .head.getLong(0) === 10L)
    Seq((1L, 1, "merged"), (5000L, 0, "merged"))
      .toDF("id", "u", "kind").createOrReplaceTempView("brdml_m")
    spark.sql("""MERGE INTO graft.`brd@wap` tgt USING brdml_m src
      ON tgt.id = src.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect()

    // branch reads (bare + time-travel-free) see the DML; main does not
    assert(spark.sql("SELECT count(*) FROM graft.`brd@wap`")
      .head.getLong(0) === 100L + 10L - 10L + 1L)
    assert(spark.sql("SELECT kind FROM graft.`brd@wap` WHERE id = 1")
      .head.getString(0) === "merged")
    assert(spark.sql("SELECT kind FROM graft.`brd@wap` WHERE id = 5")
      .head.getString(0) === "flag")
    assert(spark.sql("SELECT count(*) FROM graft.brd").head.getLong(0) === 100L)

    // publish lands the exact branch state on main
    spark.sql("ALTER TABLE graft.brd PUBLISH BRANCH wap").collect()
    assert(spark.sql("SELECT count(*) FROM graft.brd").head.getLong(0) === 101L)
    assert(spark.sql("SELECT kind FROM graft.brd WHERE id = 5000")
      .head.getString(0) === "merged")
    spark.sql("ALTER TABLE graft.brd DROP BRANCH wap").collect()

    // DML on a non-existent branch fails loudly (never creates one)
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft.`brd@nope` WHERE id = 1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table or view not found") ||
      e.getMessage.contains("nope"))
  }

  test("CLUSTERED BY INTO BUCKETS: SQL-created bucketed tables join without a shuffle") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("bkt_src")
    spark.sql(
      """CREATE TABLE graft.bkt1 SORTED BY (id)
        |CLUSTERED BY (id) INTO 4 BUCKETS AS SELECT * FROM bkt_src""".stripMargin)
      .collect()
    val t1 = IceTable.open(spark, s"$w/bkt1")
    assert(t1.cfg.bucketBy === Some((4, Seq("id"))))
    spark.sql(
      """CREATE TABLE graft.bkt2 CLUSTERED BY (id) INTO 4 BUCKETS
        |AS SELECT id, u AS u2 FROM bkt_src""".stripMargin).collect()
    // co-located join through PURE SQL: no hash-partitioning exchange
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        "SELECT count(*) AS c FROM graft.bkt1 a JOIN graft.bkt2 b ON a.id = b.id")
      assert(j.head.getLong(0) === 100L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    // SHOW CREATE renders the clause and the emitted statement round-trips
    val stmt = spark.sql("SHOW CREATE TABLE graft.bkt1").head.getString(0)
    assert(stmt.contains("CLUSTERED BY (`id`) INTO 4 BUCKETS"), stmt)
    spark.sql(stmt.replace("graft.`bkt1`", "graft.`bkt3`")).collect()
    spark.sql("INSERT INTO graft.bkt3 SELECT * FROM bkt_src").collect()
    val t3 = IceTable.open(spark, s"$w/bkt3")
    assert(t3.cfg.bucketBy === Some((4, Seq("id"))))
    assert(t3.bucketSpecFor(t3.snapshot()).isDefined)
    // 0 buckets would route every row to pmod(h, 0) = null — rejected
    val e = intercept[UnsupportedOperationException] {
      spark.sql(
        "CREATE TABLE graft.bkt0 CLUSTERED BY (id) INTO 0 BUCKETS AS SELECT * FROM bkt_src")
    }
    assert(e.getMessage.contains("bucket count"))
  }

  test("comment stripping is quote-aware for double quotes and backticks") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("q_src")
    // a double-quoted string literal carrying '--' must survive the
    // pre-recognition comment strip of a graft CTAS
    spark.sql(
      """CREATE TABLE graft.sctq AS
        |SELECT "x--y" AS s, id FROM q_src -- trailing note""".stripMargin)
      .collect()
    assert(spark.sql("SELECT s FROM graft.sctq LIMIT 1")
      .head.getString(0) === "x--y")
    assert(IceTable.open(spark, s"$w/sctq").read().count() === 100L)
  }

  test("comment stripping leaves '--' inside /* */ block comments intact") {
    val w = freshWarehouse()
    src().createOrReplaceTempView("q_src2")
    // '--' inside a bracketed comment must NOT truncate to end-of-line:
    // the CTAS body is substring'd from the stripped copy, so a naive
    // strip leaves an unterminated /* and the delegate parse fails
    spark.sql(
      """CREATE TABLE graft.sctb AS
        |SELECT id /* see -- ticket 42 */, id * 2 AS dbl
        |FROM q_src2 /* nested /* block -- too */ ok */ WHERE id < 10""".stripMargin)
      .collect()
    assert(spark.sql("SELECT count(*) FROM graft.sctb").head.getLong(0) === 9L)
    assert(spark.sql("SELECT max(dbl) FROM graft.sctb").head.getLong(0) === 18L)
    assert(IceTable.open(spark, s"$w/sctb").read().count() === 9L)
  }
}
