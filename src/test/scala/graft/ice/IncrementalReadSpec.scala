package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental (CDC-style) reads: `addedFiles`/`readAdded` tail the
  * append-only changelog of *insert* commits. Invariants: windows split
  * exactly on log commit timestamps, compaction rewrites never re-emit
  * rows, and schema evolution reads old windows under the union schema.
  */
class IncrementalReadSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(dir: String): IceTable =
    new IceTable(spark, tmpDir(dir), IceTableConfig(
      partitionExpr = concat(lit("u="), col("user")),
      sortOrder = Seq("id")))

  private def lastCommitTs(table: IceTable): Long =
    table.logio.currentLogFiles(table.root)
      .map(f => IceLogIO.logFileInfo(f)._1).max

  test("window (since, until] returns exactly the batches committed inside it") {
    val table = newTable("cdc_win")
    table.insert((0 until 10).map(i => (i.toLong, s"u${i % 2}")).toDF("id", "user"))
    val ts1 = lastCommitTs(table)
    table.insert((10 until 25).map(i => (i.toLong, s"u${i % 2}")).toDF("id", "user"))
    val ts2 = lastCommitTs(table)
    table.insert((25 until 30).map(i => (i.toLong, s"u${i % 2}")).toDF("id", "user"))

    // tail from ts1: second + third batch
    val tail = table.readAdded(ts1)
    assert(tail.count() == 20L)
    assert(tail.agg(min("id"), max("id")).as[(Long, Long)].head() == ((10L, 29L)))
    // closed window (ts1, ts2]: exactly the second batch
    assert(table.readAdded(ts1, ts2).count() == 15L)
    // since the last commit: empty, under the table schema
    val empty = table.readAdded(lastCommitTs(table))
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "user"))
  }

  test("compaction is not change data: merged logs never re-emit rows") {
    val table = newTable("cdc_merge")
    table.insert((0 until 10).map(i => (i.toLong, s"u${i % 2}")).toDF("id", "user"))
    val ts1 = lastCommitTs(table)
    table.insert((10 until 20).map(i => (i.toLong, s"u${i % 2}")).toDF("id", "user"))
    table.mergeAll() // rewrites every row into merged files + `_m` logs
    val tail = table.readAdded(ts1)
    assert(tail.count() == 10L, "only the second insert is change data")
    assert(tail.agg(min("id"), max("id")).as[(Long, Long)].head() == ((10L, 19L)))
    // and the full-table read still sees everything exactly once
    assert(table.read().count() == 20L)
  }

  test("schema evolution: old-window rows read as null in late-added columns") {
    val table = newTable("cdc_schema")
    table.insert(Seq((1L, "u1")).toDF("id", "user"))
    val ts0 = 0L
    val ts1 = lastCommitTs(table)
    table.insert(Seq((2L, "u2", "extra")).toDF("id", "user", "note"))
    // the first window predates the `note` column; union schema fills null
    val w1 = table.readAdded(ts0, ts1)
    assert(w1.columns.toSeq == Seq("id", "user", "note"))
    assert(w1.select("note").as[String].collect().toSeq == Seq(null))
    val w2 = table.readAdded(ts1)
    assert(w2.select("note").as[String].head() == "extra")
  }
}
