package graft.streaming

import graft.SparkSpec
import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous replication: the streaming change feed applied onto a
  * replica via [[Streams.cdcReplicaSink]] — drain, mutate, resume from
  * the SAME checkpoint, converge. */
class CdcReplicaSinkSpec extends SparkSpec {

  private def rows(t: IceTable): Set[(Long, Int, String)] =
    t.read().select("id", "u", "v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def drainOnce(src: IceTable, tgt: IceTable, ckpt: String): Unit = {
    val q = Streams.cdcReplicaSink(src, tgt, Seq("id"), ckpt,
      trigger = Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "replica stream did not drain in time")
  }

  test("replica follows the stream across restarts from one checkpoint") {
    import spark.implicits._
    val src = new IceTable(spark, tmpDir("crs_src"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod(col("u"), lit(2))),
      sortOrder = Seq("id")))
    val tgt = new IceTable(spark, tmpDir("crs_tgt"), IceTableConfig(
      partitionExpr = concat(lit("m="), pmod(col("id"), lit(3))),
      sortOrder = Seq("u")))
    val ckpt = tmpDir("crs_ckpt")

    src.insert((1 to 12).map(i => (i.toLong, i % 4, s"v$i")).toDF("id", "u", "v"))
    drainOnce(src, tgt, ckpt)
    assert(rows(tgt) === rows(src))

    // mutate between runs: append + CoW update + MoR delete; the second
    // run resumes from the CHECKPOINTED offset, not from zero
    src.insert(Seq((13L, 1, "v13")).toDF("id", "u", "v"))
    src.updateWhere(col("id") === 2L, Seq("v" -> lit("updated")))
    DeleteVectors.deleteWhere(src, col("id") === 5L)
    Thread.sleep(3) // settled offsets are now-1
    drainOnce(src, tgt, ckpt)
    assert(rows(tgt) === rows(src))
    assert(rows(tgt).contains((2L, 2, "updated")) &&
      !rows(tgt).exists(_._1 == 5L))

    // idle re-run: nothing new, replica unchanged, no commits written
    val logsBefore = tgt.logio.currentLogFiles(tgt.root).size
    drainOnce(src, tgt, ckpt)
    assert(tgt.logio.currentLogFiles(tgt.root).size === logsBefore)
    assert(rows(tgt) === rows(src))
  }
}
