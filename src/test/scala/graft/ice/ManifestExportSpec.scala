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
    // and the engine-side replay of both folds matches the definitions
    val gRows = MvSync.readView(gmv, gvd).collect()
    assert(gRows.length == 1 && gRows.head.getLong(0) == 1L)
    val hRows = MvSync.readView(hmv, hvd).collect()
    assert(hRows.map(_.getLong(1)).toSeq == Seq(2L)) // only g=a survives
  }
}
