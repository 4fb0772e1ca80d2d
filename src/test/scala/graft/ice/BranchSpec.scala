package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAP branches: metadata-only fork, isolated writes (insert + CoW DML +
  * compaction), fast-forward publish as one atomic diff commit, conflict
  * rejection, vacuum safety, and drop. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(tag: String): IceTable = {
    val t = new IceTable(spark, tmpDir(tag), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id")))
    t.insert(spark.range(20).select(col("id"), (col("id") * 10).as("v")))
    t
  }

  test("create is metadata-only; branch sees base; writes are isolated both ways") {
    val main = mkTable("br_iso")
    val filesBefore = main.snapshot().aliveFiles.map(_.path).toSet
    val b = Branch.create(main, "audit")
    // zero data copy: the branch's alive set IS main's file set
    assert(b.snapshot().aliveFiles.map(_.path).toSet === filesBefore)
    assert(b.read().count() === 20L)

    // branch writes: insert + CoW update + CoW delete
    b.insert(spark.range(20, 30).select(col("id"), (col("id") * 10).as("v")))
    b.updateWhere(col("id") === 1L, Seq("v" -> lit(-1L)))
    b.deleteWhere(col("id") === 2L)
    assert(b.read().count() === 29L)
    assert(b.read().where(col("v") === -1L).count() === 1L)
    // main unchanged — and a concurrent main write is invisible to the branch
    assert(main.read().count() === 20L)
    assert(main.read().where(col("v") === -1L).count() === 0L)
    Thread.sleep(3)
    main.insert(Seq((900L, 0L)).toDF("id", "v"))
    assert(b.read().count() === 29L)
    assert(Branch.list(main) === Seq("audit"))
  }

  test("fast-forward publish lands the exact branch state on main atomically") {
    val main = mkTable("br_pub")
    val b = Branch.create(main, "wap")
    b.insert(spark.range(20, 25).select(col("id"), (col("id") * 10).as("v")))
    b.deleteWhere(col("id") < 3L)
    b.optimize(maxFileSize = 1L << 30, maxFileCount = 100) // branch compaction
    val expect = b.read().select("id", "v").as[(Long, Long)].collect().toSet
    val logsBefore = main.logio.currentLogFiles(main.root).size
    val (added, removed) = Branch.publish(main, "wap")
    assert(added > 0 && removed > 0)
    // ONE commit, and main now reads exactly the branch state
    assert(main.logio.currentLogFiles(main.root).size === logsBefore + 1)
    assert(main.read().select("id", "v").as[(Long, Long)].collect().toSet === expect)
    // time travel still sees the pre-publish main
    val prePublish = main.history().orderBy(col("commit_ts"))
      .select("commit_ts").as[Long].collect()
    assert(main.read(prePublish.head + 1).count() === 20L)
    Branch.drop(main, "wap")
    assert(Branch.list(main).isEmpty)
  }

  test("publish conflicts when main moved; dv deletes reject branch handles") {
    val main = mkTable("br_conflict")
    val b = Branch.create(main, "stale")
    b.insert(Seq((100L, 1L)).toDF("id", "v"))
    Thread.sleep(3)
    main.insert(Seq((200L, 2L)).toDF("id", "v")) // main moves first
    intercept[CommitConflictException] { Branch.publish(main, "stale") }
    assert(main.read().count() === 21L) // conflict left main untouched
    val e = intercept[IllegalArgumentException] {
      DeleteVectors.deleteWhere(b, col("id") === 1L)
    }
    assert(e.getMessage.contains("branch"))
    intercept[IllegalArgumentException] { Branch.create(b, "nested") }
  }

  test("publish conflicts when a merge-on-read delete landed on main post-fork") {
    val main = mkTable("br_dvrace")
    val b = Branch.create(main, "dvrace")
    // the branch REWRITES base files (no dv marks travel with a rewrite)
    b.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    Thread.sleep(3)
    DeleteVectors.deleteWhere(main, col("id") === 5L) // post-fork MoR delete
    // publishing the rewrite would silently resurrect row 5 — conflict
    intercept[CommitConflictException] { Branch.publish(main, "dvrace") }
    assert(main.read().where(col("id") === 5L).count() === 0L)
  }

  test("orphan vacuum spares live-branch files; drop releases them") {
    val main = mkTable("br_vacuum")
    val b = Branch.create(main, "keepme")
    b.insert(spark.range(50, 60).select(col("id"), (col("id") * 10).as("v")))
    val branchOnly = b.snapshot().aliveFiles.map(_.path).toSet --
      main.snapshot().aliveFiles.map(_.path).toSet
    assert(branchOnly.nonEmpty)
    // an aggressive sweep (zero grace) must not touch live-branch files
    assert(main.vacuumOrphans(minAgeMs = 0L).isEmpty)
    assert(b.read().count() === 30L)
    // after drop they are unreferenced and the sweep reclaims them
    Branch.drop(main, "keepme")
    val swept = main.vacuumOrphans(minAgeMs = 0L).toSet
    assert(branchOnly.subsetOf(swept))
    assert(main.read().count() === 20L)
    intercept[IllegalArgumentException] { b.vacuumOrphans(minAgeMs = 0L) }
  }

  test("tombstone cleanup never reclaims files a live branch references") {
    val main = mkTable("br_clean")
    val preFiles = main.snapshot().aliveFiles.map(_.path).toSet
    val b = Branch.create(main, "pin")
    // main-side CoW delete tombstones the shared files; the branch still
    // reads them
    Thread.sleep(3)
    main.deleteWhere(col("id") >= 0L)
    assert(main.read().count() === 0L && b.read().count() === 20L)
    Thread.sleep(3)
    // an aggressive cleanup (zero grace) must NOT delete branch-pinned
    // bytes — before the fix this silently broke the branch
    val r1 = main.tombstoneCleanup(0L)
    assert(r1.cleanedLogFiles.nonEmpty)
    assert(preFiles.intersect(r1.deletedDataFiles.toSet).isEmpty,
      "cleanup reclaimed files a live branch references")
    assert(b.read().count() === 20L, "branch must still read after cleanup")
    assert(b.read().agg(sum(col("v"))).head.getLong(0) === (0L until 20L).map(_ * 10).sum)

    // publish semantics survive: main moved past the fork (the delete +
    // the cleanup), so fast-forward must conflict
    intercept[CommitConflictException] { Branch.publish(main, "pin") }

    // dropping the branch releases the pin: the NEXT cleanup reclaims
    // the (still-tombstoned, carried-forward) files for real
    Branch.drop(main, "pin")
    Thread.sleep(3)
    val r2 = main.tombstoneCleanup(0L)
    assert(preFiles.subsetOf(r2.deletedDataFiles.toSet),
      s"post-drop cleanup must reclaim: got ${r2.deletedDataFiles}")
    val fs = main.logio.fs(main.root)
    preFiles.foreach(p => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(s"${main.root}/$p")),
      s"bytes of $p must be gone after post-drop cleanup"))
    assert(main.read().count() === 0L)
  }

  test("format(\"ice\") reads and writes branches via option(\"branch\")") {
    val main = mkTable("br_fmt")
    Branch.create(main, "fio")
    spark.range(100, 105).select(col("id"), (col("id") * 10).as("v"))
      .write.format("ice").option("path", main.root)
      .option("branch", "fio").mode("append").save()
    val br = spark.read.format("ice").option("path", main.root)
      .option("branch", "fio").load()
    assert(br.count() === 25L)
    assert(spark.read.format("ice")
      .option("path", main.root).load().count() === 20L)
    // a write must never imply a fork: nonexistent branch fails loudly
    val e = intercept[IllegalArgumentException] {
      spark.range(1).select(col("id"), col("id").as("v"))
        .write.format("ice").option("path", main.root)
        .option("branch", "nope").mode("append").save()
    }
    assert(e.getMessage.contains("does not exist"))
    // layout options cannot silently override the branch's config
    val e2 = intercept[IllegalArgumentException] {
      spark.range(1).select(col("id"), col("id").as("v"))
        .write.format("ice").option("path", main.root)
        .option("branch", "fio").option("sortOrder", "v")
        .mode("append").save()
    }
    assert(e2.getMessage.contains("branch"))
  }

  test("exactly-once batch ids survive the publish (WAP ingestion replay)") {
    val main = mkTable("br_eo")
    val b = Branch.create(main, "ingest")
    assert(b.insertBatch(Seq((500L, 5L)).toDF("id", "v"), "wapq", 7L))
    assert(!b.insertBatch(Seq((500L, 5L)).toDF("id", "v"), "wapq", 7L))
    Branch.publish(main, "ingest")
    // the batch-id record carried into main: a replay against MAIN skips
    assert(!main.insertBatch(Seq((500L, 5L)).toDF("id", "v"), "wapq", 7L))
    assert(main.read().where(col("id") === 500L).count() === 1L)
  }
}
