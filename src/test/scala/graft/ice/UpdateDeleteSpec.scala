package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Atomic copy-on-write UPDATE/DELETE ([[IceTable.updateWhere]] /
  * [[IceTable.deleteWhere]]): only delete/update-carrying files rewrite,
  * the commit is one validated append, and time travel preserves the
  * pre-mutation state. */
class UpdateDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String): IceTable =
    new IceTable(spark, tmpDir(name), IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i.toLong * 10, s"v$i")).toDF("id", "score", "v")

  test("updateWhere rewrites only affected files, atomically") {
    val t = mkTable("upd")
    t.insert(batch(0, 400))   // 4 files
    t.insert(batch(400, 800)) // 4 files; only these hold id >= 400
    Thread.sleep(2)
    val preTs = System.currentTimeMillis()
    Thread.sleep(2)
    val before = t.snapshot().aliveFiles.map(_.path).toSet

    val n = t.updateWhere(col("id") >= 700, Seq("score" -> lit(-1L)))
    assert(n == 100, s"updated $n")
    val after = t.snapshot().aliveFiles.map(_.path).toSet
    // only the second insert's file for partitions holding ids 700..799
    assert((before -- after).size == 4 && (after -- before).size == 4)
    assert(t.read().count() == 800)
    assert(t.read().where(col("score") === -1L).count() == 100)
    assert(t.read().where(col("id") >= 700 && col("score") =!= -1L).count() == 0)
    // non-matching rows in rewritten files carried verbatim
    assert(t.read().where(col("id").between(400, 699))
      .agg(sum("score")).head.getLong(0) == (400L until 700L).map(_ * 10).sum)
    // time travel sees the pre-update values
    assert(t.read(preTs).where(col("score") === -1L).count() == 0)
  }

  test("deleteWhere drops rows atomically; no-match mutations commit nothing") {
    val t = mkTable("del")
    t.insert(batch(0, 400))
    val logsBefore = t.logio.currentLogFiles(t.root).length
    assert(t.deleteWhere(col("id") > 10000) == 0)
    assert(t.updateWhere(col("id") > 10000, Seq("score" -> lit(0L))) == 0)
    assert(t.logio.currentLogFiles(t.root).length == logsBefore, "no empty commits")

    val n = t.deleteWhere(col("id") % 7 === 0)
    assert(n == (0 until 400).count(_ % 7 == 0).toLong)
    assert(t.read().count() == 400 - n)
    assert(t.read().where(col("id") % 7 === 0).count() == 0)
    assert(t.read().select("id").distinct().count() == 400 - n)
  }

  test("multi-assignment UPDATE evaluates everything against original columns") {
    val t = new IceTable(spark, tmpDir("upd_multi"), IceTableConfig(
      partitionExpr = lit("p=all"), sortOrder = Seq("id")))
    t.insert(Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b"))
    // swap a and b where a = 10: both assignments must read the ORIGINAL
    // values, and the predicate on `a` must not see the updated column
    val n = t.updateWhere(col("a") === 10L, Seq("a" -> col("b"), "b" -> col("a")))
    assert(n == 1)
    val r = t.read().where($"id" === 1L).head
    assert(r.getAs[Long]("a") == 20L && r.getAs[Long]("b") == 10L,
      s"swap failed: $r")
    val untouched = t.read().where($"id" === 2L).head
    assert(untouched.getAs[Long]("a") == 30L && untouched.getAs[Long]("b") == 40L)
    // predicate-on-updated-column: SET a = -1 WHERE a >= 20 updates BOTH
    // current a values >= 20 (the just-swapped 20 and 30)
    assert(t.updateWhere(col("a") >= 20L, Seq("a" -> lit(-1L))) == 2)
    assert(t.read().where($"a" === -1L).count() == 2)
  }

  test("type-changing and unknown-column assignments fail before any write") {
    val t = new IceTable(spark, tmpDir("upd_type"), IceTableConfig(
      partitionExpr = lit("p=all"), sortOrder = Seq("id")))
    t.insert(Seq((1L, 10L)).toDF("id", "score"))
    intercept[Exception] { // bigint -> string would poison the log schema
      t.updateWhere(col("id") === 1L, Seq("score" -> lit("text")))
    }
    intercept[IllegalArgumentException] {
      t.updateWhere(col("id") === 1L, Seq("nope" -> lit(1L)))
    }
    // table unchanged and still readable
    assert(t.read().head.getAs[Long]("score") == 10L)
  }

  test("null-safe delete condition never drops null-evaluating rows") {
    val t = new IceTable(spark, tmpDir("delnull"), IceTableConfig(
      partitionExpr = lit("p=all"), sortOrder = Seq("id")))
    t.insert(Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "x"))
    // x > 6 is NULL for row 2: DELETE must treat null as not-matching
    assert(t.deleteWhere(col("x") > 6) == 1)
    assert(t.read().orderBy("id").select("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
  }
}
