package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition evolution ([[IceTable.repartitionTable]]): atomic whole-table
  * rewrite under a new partition function. */
class RepartitionSpec extends SparkSpec {

  private def mkTable(): IceTable = {
    val t = new IceTable(spark, tmpDir("graft_repart"), IceTableConfig(
      concat(lit("d="), col("d")), Seq("id")))
    t.insert(spark.range(100).select(col("id"),
      (col("id") % 10).cast("long").as("uid"),
      concat(lit("2024-01-0"), (col("id") % 3 + 1).cast("string")).as("d")))
    t.insert(spark.range(100, 140).select(col("id"),
      (col("id") % 10).cast("long").as("uid"),
      lit("2024-01-04").as("d")))
    t
  }

  test("rewrites the whole table under the new partition function atomically") {
    val t = mkTable()
    val preTs = System.currentTimeMillis() + 1
    Thread.sleep(3)
    val before = t.read().orderBy("id").collect().toSeq
    val nFiles = t.repartitionTable(concat(lit("u="), col("uid").cast("string")))
    assert(nFiles === 10) // one file per user bucket

    val snap = t.snapshot()
    val parts = snap.aliveFiles.map(m => t.partitionOf(m.path)).distinct.sorted
    assert(parts === (0 until 10).map(i => s"u=$i"))
    // row multiset byte-identical
    assert(t.read().orderBy("id").collect().toSeq === before)
    // MVCC: time travel to before the rewrite sees the OLD layout
    val old = t.snapshot(preTs)
    assert(old.aliveFiles.map(m => t.partitionOf(m.path)).forall(_.startsWith("d=")))
    assert(t.read(preTs).orderBy("id").collect().toSeq === before)
  }

  test("new partition key prunes through the FileIndex SQL path") {
    val t = mkTable()
    t.repartitionTable(concat(lit("u="), col("uid").cast("string")))
    val df = graft.plans.IceFileIndex.dataFrame(spark, t)
      .where(col("u") === "3").agg(count(lit(1)).as("c"))
    assert(df.head.getLong(0) === 14L) // ids 3,13,...,133
    assert(df.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("new sort order applies within rewritten files") {
    val t = mkTable()
    t.repartitionTable(
      concat(lit("u="), col("uid").cast("string")), newSortOrder = Seq("d", "id"))
    // within each new file rows are sorted by (d, id)
    val snap = t.snapshot()
    snap.aliveFiles.foreach { m =>
      val rows = spark.read.parquet(s"${t.root}/${m.path}")
        .select("d", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows === rows.sorted, m.path)
    }
  }

  test("empty and missing tables are no-ops") {
    val t = new IceTable(spark, tmpDir("graft_repart_empty"), IceTableConfig(
      concat(lit("d="), col("d")), Seq("id")))
    assert(t.repartitionTable(lit("p=1")) === 0)
  }

  test("tombstone cleanup after repartition deletes the old layout's files") {
    val t = mkTable()
    val oldPaths = t.snapshot().aliveFiles.map(_.path)
    t.repartitionTable(concat(lit("u="), col("uid").cast("string")))
    val before = t.read().orderBy("id").collect().toSeq
    t.tombstoneCleanup(0)
    val f = new java.io.File(t.root)
    oldPaths.foreach { p =>
      assert(!new java.io.File(f, p).exists(), s"old data file $p must be vacuumed")
    }
    assert(t.read().orderBy("id").collect().toSeq === before)
  }
}
