package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Log-only whole-partition retention ([[IceTable.dropPartitionsWhere]],
  * `ALTER TABLE … DROP PARTITIONS WHERE`, and the DELETE fast path
  * [[IceTable.tryLogOnlyDelete]]): the drop is pure metadata — zero
  * Spark jobs, zero data files read or written — and row-level
  * semantics stay exact where the fast path engages. */
class DropPartitionsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String): IceTable =
    new IceTable(spark, tmpDir(name), IceTableConfig(
      partitionExpr = concat(lit("d="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i.toLong * 10, s"v$i")).toDF("id", "score", "v")

  /** Physical `_data` listing: (relative path, length, mtime). */
  private def dataFiles(t: IceTable): Set[(String, Long, Long)] = {
    val base = java.nio.file.Paths.get(t.root, "_data")
    if (!java.nio.file.Files.isDirectory(base)) return Set.empty
    val out = Set.newBuilder[(String, Long, Long)]
    java.nio.file.Files.walk(base).forEach { p =>
      val n = p.getFileName.toString
      if (java.nio.file.Files.isRegularFile(p) && !n.startsWith("."))
        out += ((base.relativize(p).toString, java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
    }
    out.result()
  }

  /** Run `body` while counting Spark jobs; returns (result, jobs). */
  private def countingJobs[T](body: => T): (T, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // listener events are async; give the bus time to drain
      Thread.sleep(500)
      (r, jobs.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("dropPartitionsWhere is pure metadata: zero jobs, zero data files touched") {
    val t = mkTable("dropp")
    t.insert(batch(0, 400))
    t.insert(batch(400, 800))
    val before = dataFiles(t)
    assert(before.nonEmpty)

    val ((parts, files), jobs) = countingJobs(
      t.dropPartitionsWhere(col("d") <= "1"))
    assert(parts == 2, s"expected 2 partitions (d=0, d=1), got $parts")
    assert(files == 4, s"expected 4 tombstoned files, got $files")
    assert(jobs == 0, s"log-only drop must run ZERO Spark jobs, ran $jobs")
    assert(dataFiles(t) == before,
      "the drop must not write, rewrite, or delete any physical data file")

    // the surviving table is exactly the non-matching rows
    assert(t.read().count() == 400)
    assert(t.read().where(col("id") % 4 <= 1).count() == 0)
    // idempotent: nothing left to drop
    assert(t.dropPartitionsWhere(col("d") <= "1") == ((0, 0)))
  }

  test("SQL spelling: ALTER TABLE … DROP PARTITIONS WHERE, and its refusals") {
    val t = mkTable("dropsql")
    t.insert(batch(0, 400))
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    val r = spark.sql(
      s"ALTER TABLE graft.`${f.getName}` DROP PARTITIONS WHERE d = '3'").head
    assert(r.getLong(0) == 1 && r.getLong(1) == 1)
    assert(t.read().count() == 300)
    // a predicate over a NON-partition column refuses loudly — DROP
    // PARTITIONS must never silently become a rewrite
    val e = intercept[IllegalArgumentException](spark.sql(
      s"ALTER TABLE graft.`${f.getName}` DROP PARTITIONS WHERE score > 10").collect())
    assert(e.getMessage.contains("partition columns"))
  }

  test("DELETE auto-routes to the log-only drop when the predicate covers whole partitions") {
    val t = mkTable("delroute")
    t.insert(batch(0, 400))
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    val before = dataFiles(t)
    val (row, jobs) = countingJobs(
      spark.sql(s"DELETE FROM graft.`${f.getName}` WHERE d IN ('0', '2')").head)
    assert(row.getLong(0) == 200, s"rows_deleted=${row.getLong(0)}")
    assert(jobs == 0, s"partition-covering DELETE must be log-only, ran $jobs jobs")
    assert(dataFiles(t) == before)
    assert(t.read().count() == 200)
    assert(t.read().where(col("id") % 2 === 0).count() == 0)
  }

  test("DELETE falls back to CoW when the predicate shadows a data column or mixes in row columns") {
    // partition key name == data column name: the scan serves the FILE's
    // values for it, so the fast path must refuse (values could differ)
    val t = new IceTable(spark, tmpDir("delshadow"), IceTableConfig(
      partitionExpr = concat(lit("score="), (col("score") % 2).cast("string")),
      sortOrder = Seq("id")))
    t.insert(batch(0, 100)) // score = id*10, all even → one partition
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    // row semantics: score=500 deletes ONE row, not the whole partition
    val r = spark.sql(
      s"DELETE FROM graft.`${f.getName}` WHERE score = 500").head
    assert(r.getLong(0) == 1)
    assert(t.read().count() == 99)

    // mixed predicate (partition key + data column) also falls back
    val t2 = mkTable("delmixed")
    t2.insert(batch(0, 400))
    val f2 = new java.io.File(t2.root)
    val r2 = spark.sql(
      s"DELETE FROM graft.`${f2.getName}` WHERE d = '1' AND id < 100").head
    assert(r2.getLong(0) == 25)
    assert(t2.read().count() == 375)
  }

  test("DELETE falls back to CoW when deletion vectors exist (count stays exact)") {
    val t = mkTable("deldv")
    t.insert(batch(0, 400))
    DeleteVectors.deleteWhere(t, col("id") === 1L) // dv side table now exists
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    val r = spark.sql(s"DELETE FROM graft.`${f.getName}` WHERE d = '1'").head
    // id=1 was already dv-deleted: 100 rows in d=1 minus 1
    assert(r.getLong(0) == 99, s"rows_deleted=${r.getLong(0)}")
    assert(t.read().count() == 300)
  }

  test("bucketed tables drop every bucket directory of a matching partition") {
    val t = new IceTable(spark, tmpDir("dropbkt"), IceTableConfig(
      partitionExpr = concat(lit("d="), (col("id") % 2).cast("string")),
      sortOrder = Seq("id"),
      bucketBy = Some((4, Seq("id")))))
    t.insert(batch(0, 400))
    val (parts, files) = t.dropPartitionsWhere(col("d") === "0")
    assert(parts == 4, s"d=0 spans 4 bucket dirs, got $parts") // d=0/bkt=0..3
    assert(files == 4)
    assert(t.read().count() == 200)
    assert(t.read().where(col("id") % 2 === 0).count() == 0)
  }

  test("DROP PARTITIONS is refused on materialized views") {
    val base = mkTable("dropmv_base")
    base.insert(batch(0, 40))
    val f = new java.io.File(base.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    val view = s"${f.getName}_v"
    Thread.sleep(5)
    spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
      SELECT v, count(*) AS cnt FROM graft.`${f.getName}` GROUP BY v""").collect()
    val e = intercept[IllegalArgumentException](spark.sql(
      s"ALTER TABLE graft.`$view` DROP PARTITIONS WHERE g = 'x'").collect())
    assert(e.getMessage.contains("MATERIALIZED VIEW"))
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$view`").collect()
  }
}
