package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

/** Metadata-only `count(*)` ([[org.apache.spark.sql.graft
  * .MetadataOnlyCount]]): per-file row counts recorded in markers at
  * write time answer groupless filterless counts from the log alone —
  * and every shape that could make that wrong (filters, deletion
  * vectors, rc-less legacy markers) falls back to a real scan. */
class MetaCountSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String, n: Int = 100): IceTable = {
    val t = new IceTable(spark, tmpDir(tag), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))),
      sortOrder = Seq("id")))
    t.insert((1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t
  }

  private def countPlan(t: IceTable) = graft.plans.IceFileIndex
    .dataFrame(spark, t).agg(count(lit(1)).as("cnt"))

  private def isMetaOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]

  test("count(*) plans as LocalRelation and matches the scan count") {
    val t = mk("mc_base")
    Thread.sleep(3) // ms-separate the commits for the time-travel read
    t.insert((101 to 150).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(t.snapshot().aliveFiles.forall(_.rowCount.isDefined))
    val df = countPlan(t)
    assert(isMetaOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.head.getLong(0) === 150L)
    // CollapseProject folds withColumn constants INTO the aggregate list;
    // constant aliases must not block the rewrite
    val withConst = countPlan(t).withColumn("tag", lit(true))
    assert(isMetaOnly(withConst), withConst.queryExecution.optimizedPlan.toString)
    val r = withConst.head
    assert(r.getLong(0) === 150L && r.getBoolean(1))
    // compaction rewrites carry row counts too
    t.optimize()
    val df2 = countPlan(t)
    assert(isMetaOnly(df2))
    assert(df2.head.getLong(0) === 150L)
    // time travel: the as-of snapshot's markers answer the as-of count
    val firstTs = t.logio.currentLogFiles(t.root)
      .map(p => IceLogIO.logFileInfo(p)._1).min
    val early = graft.plans.IceFileIndex.dataFrame(spark, t, firstTs + 1)
      .agg(count(lit(1)).as("cnt"))
    assert(isMetaOnly(early))
    assert(early.head.getLong(0) === 100L)
  }

  test("filters, count(col), and grouped counts block the rewrite") {
    val t = mk("mc_filter")
    val filtered = graft.plans.IceFileIndex.dataFrame(spark, t)
      .where(col("id") > 50L).agg(count(lit(1)).as("cnt"))
    assert(!isMetaOnly(filtered))
    assert(filtered.head.getLong(0) === 50L)
    val countCol = graft.plans.IceFileIndex.dataFrame(spark, t)
      .agg(count(col("v")).as("cnt"))
    assert(!isMetaOnly(countCol))
    val grouped = graft.plans.IceFileIndex.dataFrame(spark, t)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    assert(!isMetaOnly(grouped))
  }

  test("deletion vectors overlay the scan: fallback, and the count is MoR-correct") {
    val t = mk("mc_dv")
    DeleteVectors.deleteWhere(t, col("id") <= 10L)
    val df = countPlan(t)
    assert(!isMetaOnly(df), "dv overlay must block the metadata count")
    assert(df.head.getLong(0) === 90L)
  }

  test("min/max over stats-covered numeric columns fold to metadata") {
    val t = new IceTable(spark, tmpDir("mc_minmax"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))),
      sortOrder = Seq("id"), statsColumns = Seq("id", "x")))
    t.insert((1 to 100).map(i => (i.toLong, i * 0.5, s"v$i")).toDF("id", "x", "v"))
    t.insert((101 to 120).map(i => (i.toLong, i * 0.5, s"v$i")).toDF("id", "x", "v"))
    val df = graft.plans.IceFileIndex.dataFrame(spark, t)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
        max(col("x")).as("mxx"), count(lit(1)).as("cnt"))
    assert(isMetaOnly(df), df.queryExecution.optimizedPlan.toString)
    val r = df.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 120L &&
      r.getDouble(2) === 60.0 && r.getLong(3) === 120L)
    // merged files re-record stats: still metadata after compaction
    t.optimize()
    val df2 = graft.plans.IceFileIndex.dataFrame(spark, t)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    assert(isMetaOnly(df2))
    assert(df2.head.getLong(1) === 120L)
    // an UNCOVERED column (v: no stats; also non-numeric) must scan
    val un = graft.plans.IceFileIndex.dataFrame(spark, t)
      .agg(max(col("v")).as("m"))
    assert(!isMetaOnly(un))
    assert(un.head.getString(0) === "v99")
  }

  test("legacy rc-less markers disable the fast path, not the answer") {
    val t = mk("mc_legacy")
    // simulate a reference-written log: strip the rc field from every
    // marker line on disk, then re-fold from a fresh handle
    val dir = java.nio.file.Paths.get(t.root, "_log")
    java.nio.file.Files.list(dir).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".jsonl")) {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        java.nio.file.Files.write(p,
          txt.replaceAll(""", "rc": \d+""", "").getBytes("UTF-8"))
        // the NIO rewrite invalidates Hadoop LocalFileSystem's checksum
        // sidecar — drop it (exactly what a reference writer, which
        // writes no .crc at all, would look like)
        java.nio.file.Files.deleteIfExists(p.resolveSibling(s".$n.crc"))
      }
    }
    val t2 = new IceTable(spark, t.root, IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))),
      sortOrder = Seq("id")))
    assert(t2.snapshot().aliveFiles.forall(_.rowCount.isEmpty))
    val df = countPlan(t2)
    assert(!isMetaOnly(df), "an rc-less marker must disable the rewrite")
    assert(df.head.getLong(0) === 100L)
  }
}
