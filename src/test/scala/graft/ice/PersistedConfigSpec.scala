package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 8: the table's configuration (sort order, partition expression,
  * stats columns, merge SQL, ...) is persisted in every log commit's
  * metadata line and reconstructed by [[IceTable.open]] — so SQL-path DML
  * through the catalog writes the same sorted, stats-bearing files as the
  * original configured handle, and config survives log compaction. */
class PersistedConfigSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("open() reconstructs the persisted config from the log") {
    val dir = tmpDir("cfg_roundtrip")
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id"),
      customMergeSql = Some("select * from source_files"),
      statsColumn = Some("id"),
      statsColumns = Seq("v"),
      bloomFilterColumns = Seq("id"),
      compressionCodec = "zstd",
      rowGroupRows = Some(1000),
      sortOnMerge = true))
    t.insert(batch(0, 100))

    val reopened = IceTable.open(spark, dir)
    assert(reopened.cfg.sortOrder == Seq("id"))
    assert(reopened.cfg.customMergeSql.contains("select * from source_files"))
    assert(reopened.cfg.statsColumn.contains("id"))
    assert(reopened.cfg.statsColumns == Seq("v"))
    assert(reopened.cfg.bloomFilterColumns == Seq("id"))
    assert(reopened.cfg.compressionCodec == "zstd")
    assert(reopened.cfg.rowGroupRows.contains(1000))
    assert(reopened.cfg.sortOnMerge)
    // the reconstructed partition expression routes identically
    reopened.insert(batch(100, 104))
    val parts = reopened.snapshot().aliveFiles
      .map(m => reopened.partitionOf(m.path)).toSet
    assert(parts == Set("p=0", "p=1", "p=2", "p=3"))
    assert(reopened.read().count() == 104)
  }

  test("default-config tables emit no cfg field (reference log bytes untouched)") {
    val dir = tmpDir("cfg_bare")
    val t = new IceTable(spark, dir, IceTableConfig(lit(""), Seq.empty))
    t.insert(batch(0, 10).withColumn("_partition", lit("all")))
    val logs = t.logio.currentLogFiles(dir)
    val lines = t.logio.fetchLogLines(dir, logs)(logs.head)
    assert(!lines(0).contains("\"cfg\""), s"unexpected cfg in: ${lines(0)}")
    assert(IceTable.open(spark, dir).cfg.sortOrder.isEmpty)
  }

  test("config survives compaction and tombstone cleanup") {
    val dir = tmpDir("cfg_cleanup")
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 2).cast("string")),
      sortOrder = Seq("id"), statsColumn = Some("id")))
    t.insert(batch(0, 50)); t.insert(batch(50, 100))
    t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    t.tombstoneCleanup(0) // deletes the original cfg-bearing logs
    val reopened = IceTable.open(spark, dir)
    assert(reopened.cfg.sortOrder == Seq("id"))
    assert(reopened.cfg.statsColumn.contains("id"))
  }

  test("config survives a rewrite committed through a BARE handle") {
    val dir = tmpDir("cfg_bare_rewrite")
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 2).cast("string")),
      sortOrder = Seq("id")))
    t.insert(batch(0, 50)); t.insert(batch(50, 100))
    // a default-config handle compacts + cleans: its logs must carry the
    // FOLDED config forward, not drop it
    val bare = new IceTable(spark, dir, IceTableConfig(lit(""), Seq.empty))
    bare.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    bare.tombstoneCleanup(0)
    assert(IceTable.open(spark, dir).cfg.sortOrder == Seq("id"))
  }

  test("SQL DML through the catalog writes sorted, stats-bearing files") {
    val dir = tmpDir("cfg_sqldml")
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 2).cast("string")),
      sortOrder = Seq("id"), statsColumn = Some("id")))
    t.insert(batch(0, 200))
    val f = new java.io.File(dir)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    spark.sql(s"UPDATE graft.`${f.getName}` SET v = 'u' WHERE id % 7 = 3").collect()
    val snap = t.snapshot()
    // every alive file (including the SQL-rewritten ones) carries id stats
    assert(snap.aliveFiles.nonEmpty)
    snap.aliveFiles.foreach { m =>
      assert(m.stats.nonEmpty, s"missing stats on ${m.path} after SQL UPDATE")
    }
    // and the rewritten files are still sorted by id
    snap.aliveFiles.foreach { m =>
      val ids = spark.read.parquet(s"$dir/${m.path}")
        .select("id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"unsorted rewrite ${m.path}")
    }
    assert(t.read().where(col("v") === "u").count() ==
      (0 until 200).count(_ % 7 == 3))
  }

  test("format(\"ice\") append does not clobber the persisted config") {
    val dir = tmpDir("cfg_fmt_append")
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id"), statsColumn = Some("id")))
    t.insert(batch(0, 50))
    // bare append: the existing table's config must stay authoritative
    batch(50, 60).write.format("ice").option("path", dir)
      .mode("append").save()
    val reopened = IceTable.open(spark, dir)
    assert(reopened.cfg.sortOrder == Seq("id"), "sortOrder clobbered")
    assert(reopened.cfg.statsColumn.contains("id"), "stats clobbered")
    // the appended rows routed under the PERSISTED partition scheme
    val parts = reopened.snapshot().aliveFiles
      .map(m => reopened.partitionOf(m.path)).toSet
    assert(parts == Set("p=0", "p=1", "p=2", "p=3"), s"routed to $parts")
    assert(reopened.read().count() == 60)
    // explicit options still reconfigure deliberately
    batch(60, 62).write.format("ice").option("path", dir)
      .option("partitionExpr", "'q=' || cast(id % 2 as string)")
      .mode("append").save()
    val parts2 = IceTable.open(spark, dir).snapshot().aliveFiles
      .map(m => reopened.partitionOf(m.path)).toSet
    assert(parts2.exists(_.startsWith("q=")))
  }

  test("repartitionTable persists the NEW partition scheme") {
    val dir = tmpDir("cfg_repart")
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 2).cast("string")),
      sortOrder = Seq("id")))
    t.insert(batch(0, 100))
    t.repartitionTable(concat(lit("q="), (col("id") % 8).cast("string")))
    val reopened = IceTable.open(spark, dir)
    // inserts through the reconstructed handle must route under the NEW
    // scheme (the rewrite's log carries the new config, not the old one)
    reopened.insert(batch(100, 108))
    val parts = reopened.snapshot().aliveFiles
      .map(m => reopened.partitionOf(m.path)).toSet
    assert(parts.forall(_.startsWith("q=")), s"stale routing: $parts")
    assert(reopened.read().count() == 108)
  }

  test("formatRow type conversion validates post-hook (reopened same-cfg handle)") {
    val dir = tmpDir("cfg_fmt_preflight")
    val cfg = IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("id"),
      formatRow = Some(df => df.withColumn("v", col("v").cast("bigint"))))
    val t = new IceTable(spark, dir, cfg)
    import spark.implicits._
    val strBatch = (0 until 10).map(i => (i.toLong, s"$i")).toDF("id", "v")
    t.insert(strBatch) // v lands as BIGINT via the hook
    // a SECOND handle (fresh preflight cache seeded from the log) must
    // accept the same raw string batch: the hook converts it
    val t2 = new IceTable(spark, dir, cfg)
    t2.insert(strBatch)
    assert(t2.read().count() == 20)
    assert(t2.snapshot().schema.pairs.toMap[String, String].apply("v") == "BIGINT")
  }

  test("roots with URI-encodable characters are rejected loudly") {
    val base = java.nio.file.Files.createTempDirectory("cfg bad root").toString
    val e = intercept[IllegalArgumentException] {
      new IceTable(spark, base, IceTableConfig(lit("all"), Seq.empty))
    }
    assert(e.getMessage.contains("URI encoding"), e.getMessage)
    // and a partition VALUE with a space fails at write, not silently
    val t = new IceTable(spark, tmpDir("cfg_badpart"), IceTableConfig(
      partitionExpr = concat(lit("p="), col("v")), sortOrder = Seq("id")))
    import spark.implicits._
    val bad = Seq((1L, "a b")).toDF("id", "v")
    val e2 = intercept[Exception] { t.insert(bad) }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e2).exists(_.contains("URI encoding")), e2)
    assert(t.trySnapshot().isEmpty, "no commit must land")
  }

  test("UPDATE of a partition-deriving column is rejected via persisted expr") {
    val dir = tmpDir("cfg_guard")
    val t = new IceTable(spark, dir, IceTableConfig(
      // partition derived from a column WITHOUT a k=v path segment: the
      // path-derived key set is useless here; the guard must come from
      // the persisted partition expression's references
      partitionExpr = (col("id") % 2).cast("string"),
      sortOrder = Seq("id")))
    t.insert(batch(0, 20))
    val f = new java.io.File(dir)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`${f.getName}` SET id = id + 1").collect()
    }
    assert(e.getMessage.contains("partition-deriving"), e.getMessage)
    // non-deriving columns still update fine
    spark.sql(s"UPDATE graft.`${f.getName}` SET v = 'x' WHERE id = 3").collect()
    assert(t.read().where(col("v") === "x").count() == 1)
  }
}
