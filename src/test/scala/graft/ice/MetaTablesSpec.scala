package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata tables: files/partitions/history as pure functions of the
  * snapshot fold — footer-derived physical counts, time travel, and the
  * TVF SQL spelling. */
class MetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(tag: String): IceTable =
    new IceTable(spark, tmpDir(tag), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))),
      sortOrder = Seq("id")))

  private def rows(n: Int) =
    spark.range(n).select(col("id"), (col("id") * 10).as("v"))

  test("files/partitions reconcile with the data; counts are physical (pre-dv)") {
    val t = newTable("meta_base")
    t.insert(rows(90))
    val files = MetaTables.files(t)
    assert(files.agg(sum("row_count")).head.getLong(0) === 90L)
    assert(files.select("partition").distinct().count() === 3L)
    // partitions roll files up exactly
    val parts = MetaTables.partitions(t)
      .orderBy("partition").collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("p=0", "p=1", "p=2"))
    assert(parts.map(r => r.getLong(2)).sum === 90L)
    assert(parts.map(r => r.getLong(1)).sum === files.count())
    // bytes come from the log markers, and real files are never empty
    assert(files.where(col("bytes") <= 0).count() === 0L)

    // merge-on-read delete: logical count drops, PHYSICAL metadata count
    // does not (Iceberg record_count semantics) until a rewrite
    DeleteVectors.deleteWhere(t, col("id") < 10)
    assert(t.read().count() === 80L)
    assert(MetaTables.files(t).agg(sum("row_count")).head.getLong(0) === 90L)
  }

  test("metadata time-travels with the same fold as reads; empty table is empty") {
    val t = newTable("meta_tt")
    assert(MetaTables.files(t).count() === 0L) // no snapshot yet → empty
    t.insert(rows(30))
    Thread.sleep(3)
    val mid = System.currentTimeMillis()
    Thread.sleep(3)
    t.insert(rows(30))
    val asOf = MetaTables.files(t, mid + 1)
    assert(asOf.agg(sum("row_count")).head.getLong(0) === 30L)
    assert(MetaTables.files(t).agg(sum("row_count")).head.getLong(0) === 60L)
    // compaction changes the file set, not the physical totals
    t.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val after = MetaTables.files(t)
    assert(after.count() === 3L) // one merged file per partition
    assert(after.agg(sum("row_count")).head.getLong(0) === 60L)
    // history is the commit trail (2 inserts + 1 merge)
    assert(MetaTables.relation(t, "history", Long.MaxValue).count() === 3L)
  }

  test("TVF spelling: table_files/table_partitions/table_history (+ asOf)") {
    val t = newTable("meta_tvf")
    t.insert(rows(30))
    Thread.sleep(3)
    val mid = System.currentTimeMillis()
    Thread.sleep(3)
    t.insert(rows(30))
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    val n = f.getName
    assert(spark.sql(s"SELECT sum(row_count) FROM table_files('$n')")
      .head.getLong(0) === 60L)
    assert(spark.sql(
      s"SELECT sum(row_count) FROM table_files('$n', $mid)")
      .head.getLong(0) === 30L)
    assert(spark.sql(
      s"SELECT count(*) FROM table_partitions('$n')").head.getLong(0) === 3L)
    assert(spark.sql(
      s"SELECT count(*) FROM table_history('$n')").head.getLong(0) === 2L)
    // unknown table fails loudly
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM table_files('nope_missing')").collect()
    }
    assert(err.getMessage.contains("does not exist"))
  }
}
