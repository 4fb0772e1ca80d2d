package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Foreign-engine manifest export: a static JSON + SQL artifact that lets
  * any parquet reader query a snapshot with no graft code and no log
  * fold. The spec verifies the manifest lists EXACTLY the alive set,
  * that reading through it reproduces the table, and that the generated
  * DuckDB view applies deletion vectors (semantics replayed here with
  * Spark on the same file lists the SQL embeds). */
class ManifestExportSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String): IceTable =
    new IceTable(spark, tmpDir(name), IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("manifest lists exactly the alive snapshot and reproduces the table") {
    val t = mkTable("man_basic")
    t.insert(batch(0, 200)); t.insert(batch(200, 400))
    t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    val dest = s"${t.root}/_export/manifest.json"
    val n = ManifestExport.writeManifest(t, dest)
    val (schema, files, dels) = ManifestExport.readManifest(t, dest)
    assert(n == files.length)
    assert(dels.isEmpty)
    assert(schema == t.snapshot().schema.pairs.toMap)
    assert(files.toSet ==
      t.snapshot().aliveFiles.map(m => s"${t.qualifiedRoot}/${m.path}").toSet)
    // a foreign reader = plain parquet scan of the listed absolute paths
    val foreign = spark.read.parquet(files: _*)
    assert(foreign.count() == 400)
    assert(foreign.agg(sum("id")).head.getLong(0) ==
      t.read().agg(sum("id")).head.getLong(0))
  }

  test("manifest pins a snapshot: re-export after new commits advances") {
    val t = mkTable("man_pin")
    t.insert(batch(0, 100))
    val d1 = s"${t.root}/_export/m1.json"
    ManifestExport.writeManifest(t, d1)
    t.insert(batch(100, 200))
    val (_, files1, _) = ManifestExport.readManifest(t, d1)
    assert(spark.read.parquet(files1: _*).count() == 100, "old manifest = old snapshot")
    val d2 = s"${t.root}/_export/m2.json"
    ManifestExport.writeManifest(t, d2)
    val (_, files2, _) = ManifestExport.readManifest(t, d2)
    assert(spark.read.parquet(files2: _*).count() == 200)
  }

  test("deletion vectors export and the DuckDB view's anti-join semantics hold") {
    val t = mkTable("man_dv")
    t.insert(batch(0, 100))
    DeleteVectors.deleteWhere(t, col("id") < 10)
    val dest = s"${t.root}/_export/manifest.json"
    ManifestExport.writeManifest(t, dest)
    val (_, files, dels) = ManifestExport.readManifest(t, dest)
    assert(dels.nonEmpty, "dv files must be exported")
    val sql = ManifestExport.writeDuckDbView(t, s"${t.root}/_export/view.sql", "v")
    assert(sql.contains("file_row_number") && sql.contains("ends_with"),
      s"dv anti-join missing from generated SQL:\n$sql")
    // replay the generated view's semantics with Spark over the SAME
    // lists the SQL embeds: scan + (filename, row_number) anti-join
    val marks = spark.read.parquet(dels: _*) // (path, row_index)
    val scanned = spark.read.parquet(files: _*)
      .withColumn("_f", col("_metadata.file_path"))
      .withColumn("_r", col("_metadata.row_index"))
    val kept = scanned.join(marks,
      scanned("_f").endsWith(marks("path")) && scanned("_r") === marks("row_index"),
      "left_anti")
    assert(kept.count() == 90)
    assert(kept.count() == t.read().count(), "foreign view == engine read")
    // the dv-free view shape stays join-free
    val t2 = mkTable("man_plain")
    t2.insert(batch(0, 10))
    val sql2 = ManifestExport.duckDbViewSql(t2, "v2")
    assert(!sql2.contains("file_row_number"))
  }

  test("global and HAVING view exports carry the engine's read semantics") {
    import graft.operators.MvSync
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // GLOBAL view: the export must union in the one-row aggregate
    // identity when the fold is empty — exactly projectView's rule
    // (shape validated against DuckDB: fully-negated folds read (0,
    // NULL), revived folds read the summed signed history)
    val base = new IceTable(spark, tmpDir("manx_base"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    base.insert(Seq((1L, 5L)).toDF("id", "v"))
    val gvd = MvSync.MvViewDef("b", Nil, Seq(
      MvSync.MvOutput("cnt", "cnt", ""), MvSync.MvOutput("s", "sum", "v")))
    val gmv = MvSync.create(spark, tmpDir("manx_gmv"), gvd.spec,
      viewDef = Some(gvd))
    Thread.sleep(5)
    MvSync.syncFromFeed(base, gmv, gvd.spec)
    val gsql = ManifestExport.duckDbViewSql(gmv, "gv")
    assert(gsql.contains("UNION ALL") && gsql.contains("CAST(0 AS BIGINT)") &&
      gsql.contains("NOT EXISTS"), s"global identity row missing:\n$gsql")
    assert(gsql.contains("\"_mv_all\""), "fold must key on the synthetic group")
    // HAVING view: the predicate applies OVER the projected aliases,
    // outside the fold, exactly like the engine's read rule
    val hvd = MvSync.MvViewDef("b", Seq("g"), Seq(
      MvSync.MvOutput("cnt", "cnt", "")), havingSql = Some("`cnt` > 1"))
    val hmv = MvSync.create(spark, tmpDir("manx_hmv"), hvd.spec,
      viewDef = Some(hvd))
    val b2 = new IceTable(spark, tmpDir("manx_b2"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    b2.insert(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g"))
    Thread.sleep(5)
    MvSync.syncFromFeed(b2, hmv, hvd.spec)
    val hsql = ManifestExport.duckDbViewSql(hmv, "hv")
    assert(hsql.contains(") _v WHERE"), s"HAVING filter missing:\n$hsql")
    // the predicate is TRANSLATED to DuckDB dialect, never embedded as
    // Spark-rendered text: identifiers double-quoted, no backticks left
    assert(hsql.contains("""_v WHERE "cnt" > 1"""),
      s"HAVING must export in DuckDB dialect:\n$hsql")
    assert(!hsql.contains("`"), s"backticks leaked into the export:\n$hsql")
    // and the engine-side replay of both folds matches the definitions
    val gRows = MvSync.readView(gmv, gvd).collect()
    assert(gRows.length == 1 && gRows.head.getLong(0) == 1L)
    val hRows = MvSync.readView(hmv, hvd).collect()
    assert(hRows.map(_.getLong(1)).toSeq == Seq(2L)) // only g=a survives
  }

  test("HAVING translation: Spark-rendered predicates become valid DuckDB tokens") {
    val tr = ManifestExport.havingToDuckDb _
    // backtick identifiers → double quotes; typed literal suffixes
    // (1.5BD decimal, 1.5D double, 2L bigint, 2S/2Y small/tiny) stripped
    assert(tr("(`total` > 1.5BD) AND (`cnt` >= 2L)") ==
      """("total" > 1.5) AND ("cnt" >= 2)""")
    assert(tr("`mean` > 1.25D OR `lo` <= 3S OR `hi` <> 4Y") ==
      """"mean" > 1.25 OR "lo" <= 3 OR "hi" <> 4""")
    // exponent forms keep the exponent, lose only the suffix
    assert(tr("`x` < 1.0E10D") == """"x" < 1.0E10""")
    // escaped quotes inside identifiers re-escape for DuckDB
    assert(tr("`a``b` = 1 AND `c\"d` = 2") ==
      """"a`b" = 1 AND "c""d" = 2""")
    // string literals are untouchable — suffix-looking text stays
    assert(tr("`g` = '1.5BD' AND `h` = 'it''s `fine`'") ==
      """"g" = '1.5BD' AND "h" = 'it''s `fine`'""")
    // plain numbers and non-suffix identifiers pass through
    assert(tr("cnt2 > 10 AND g7 = 7") == "cnt2 > 10 AND g7 = 7")
    // portable function spellings and CAST types pass through
    assert(tr("abs(`total`) > 2 AND coalesce(`cnt`, 0) >= 1") ==
      """abs("total") > 2 AND coalesce("cnt", 0) >= 1""")
    assert(tr("CAST(`total` AS DOUBLE) > 1.5D") ==
      """CAST("total" AS DOUBLE) > 1.5""")
    assert(tr("cast(`c` AS DECIMAL(10,2)) = 1") ==
      """cast("c" AS DECIMAL(10,2)) = 1""")
    // function names inside strings are content, not calls
    assert(tr("`g` = 'f(3)'") == """"g" = 'f(3)'""")
    // malformed input refuses loudly rather than exporting broken SQL
    intercept[UnsupportedOperationException](tr("`unclosed > 1"))
    intercept[UnsupportedOperationException](tr("'unclosed"))
    // NON-PORTABLE tokens refuse at WRITE time, never a broken view.sql:
    // unknown function spellings and Spark-only CAST target types
    val ef = intercept[UnsupportedOperationException](tr("f(3) = 7"))
    assert(ef.getMessage.contains("no known portable spelling"))
    intercept[UnsupportedOperationException](tr("date_format(`d`, 'yyyy') = '2024'"))
    val ec = intercept[UnsupportedOperationException](
      tr("CAST(`x` AS BINARY) = `y`"))
    assert(ec.getMessage.contains("not portable"))
    intercept[UnsupportedOperationException](tr("CAST(`x` AS ARRAY<INT>) = `y`"))
  }

  test("a star-join view exports: the fold SQL applies to the materialized partials, no dim needed") {
    import graft.operators.MvSync
    // join-view MV rows STORE the dim-sourced group column and the
    // sanitized aggregate args, so the manifest fold is dim-free — the
    // r14 stretch item: verify the export serves a joinDims view
    val fact = new IceTable(spark, tmpDir("manj_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    val dim = new IceTable(spark, tmpDir("manj_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val vd = MvSync.MvViewDef("fact", Seq("cat"), Seq(
      MvSync.MvOutput("cnt", "cnt", ""),
      MvSync.MvOutput("total", "sum", "f.v")),
      dims = Seq(MvSync.MvJoinDim("dim", "f", "d", "f.k = d.k")))
    val mv = MvSync.create(spark, tmpDir("manj_mv"), vd.spec,
      viewDef = Some(vd))
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L), (3L, "k1", 2L))
      .toDF("id", "k", "v"))
    Thread.sleep(5)
    MvSync.syncFromFeed(fact, mv, vd.spec, dimTables = Seq(dim))
    // a second window so the export folds across generations for real
    fact.insert(Seq((4L, "k2", 1L)).toDF("id", "k", "v"))
    Thread.sleep(5)
    MvSync.syncFromFeed(fact, mv, vd.spec, dimTables = Seq(dim))
    val dest = s"${mv.root}/_export/manifest.json"
    ManifestExport.writeManifest(mv, dest)
    val sql = ManifestExport.duckDbViewSql(mv, "jv")
    assert(sql.contains("\"cat\"") && sql.contains("sum_f_v") &&
      sql.contains("_rgen") && !sql.contains("`"),
      s"join-view fold SQL malformed:\n$sql")
    // replay the fold over exactly the manifest's file list — no log
    // fold, no dim table — and compare with the engine's read
    val (_, files, _) = ManifestExport.readManifest(mv, dest)
    val foreign = MvSync.projectView(MvSync.foldPartials(
      spark.read.schema(mv.snapshot().schema.toStructType)
        .parquet(files: _*), vd.spec), vd)
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val engine = MvSync.readView(mv, vd).orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(foreign == engine && foreign == Seq(("A", 2L, 7L), ("B", 2L, 10L)))
  }
}
