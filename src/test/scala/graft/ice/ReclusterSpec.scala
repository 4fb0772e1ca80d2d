package graft.ice

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** OPTIMIZE ZORDER after the fact: `recluster` rewrites already-ingested
  * (badly laid out) files into z-ordered range slices under one atomic
  * commit, unlocking multi-dimension stats pruning retroactively. */
class ReclusterSpec extends SparkSpec {
  import spark.implicits._

  private def grid(n: Int) = (0 until n).map { i =>
    val x = (i % 64).toLong * 64
    val y = (i / 64).toLong * 64
    (x, y, i.toLong)
  }.toDF("x", "y", "id")

  test("recluster preserves content, replaces layout, keeps time travel") {
    val n = 4096
    val table = new IceTable(spark, tmpDir("recluster"), IceTableConfig(
      partitionExpr = lit("p=all"),
      sortOrder = Seq("id"),
      statsColumn = Some("x"),
      statsColumns = Seq("y")))
    // 8 inserts of consecutive row-id bands: each band sweeps the FULL x
    // range (x = id % 64 scaled), so every file's x-stats span ~everything
    // — the worst case for x pruning
    val df = grid(n)
    (0 until 8).foreach(s =>
      table.insert(df.where((col("id") / 512).cast("long") === s)))
    val before = table.snapshot()
    assert(before.aliveFiles.length == 8)
    val preTs = System.currentTimeMillis() + 1

    // a thin x-slice matches ALL 8 files before reclustering
    val win = Map("x" -> (Some("0"), Some("63")))
    assert(table.filesMatchingStats(before, win).length == 8)

    val z = ZOrder.zvalue(6,
      ZOrder.scaled(col("x"), 0, n - 1, 6),
      ZOrder.scaled(col("y"), 0, n - 1, 6))
    Thread.sleep(2)
    assert(table.recluster(z, filesPer = 16) == 1)

    val after = table.snapshot()
    assert(after.aliveFiles.length == 16)
    // content identical
    assert(table.read().count() == n)
    assert(table.read().select("x", "y", "id").orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // the same thin slice now prunes most files ON BOTH DIMENSIONS
    val prunedX = table.filesMatchingStats(after, win)
    assert(prunedX.length < 8, s"x-window still matches ${prunedX.length}")
    val prunedY = table.filesMatchingStats(after,
      Map("y" -> (Some("0"), Some("63"))))
    assert(prunedY.length < 8, s"y-window still matches ${prunedY.length}")
    // pruned read agrees with the full filter
    val viaStats = table.readFiles(after, prunedX)
      .where(col("x").between(0, 63)).count()
    val full = table.read().where(col("x").between(0, 63)).count()
    assert(viaStats == full && full == 64L)

    // time travel to before the recluster sees the old 8-file layout
    val old = table.snapshot(preTs)
    assert(old.aliveFiles.length == 8)
    assert(table.readFiles(old, old.aliveFiles).count() == n)
  }

  test("sortOnMerge keeps compacted files globally sorted; default concatenates") {
    def build(sortOnMerge: Boolean): IceTable = {
      val t = new IceTable(spark, tmpDir("sortmerge"), IceTableConfig(
        partitionExpr = lit("p=all"),
        sortOrder = Seq("k"),
        sortOnMerge = sortOnMerge))
      // two batches with interleaved key ranges: concatenation of the two
      // sorted files is NOT globally sorted
      val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      t.insert(df.where(col("k") % 2 === 0))
      t.insert(df.where(col("k") % 2 === 1))
      t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      t
    }
    def fileIsSorted(t: IceTable): Boolean = {
      val snap = t.snapshot()
      assert(snap.aliveFiles.length == 1)
      val ks = spark.read
        .parquet(s"${t.root}/${snap.aliveFiles.head.path}")
        .select("k").collect().map(_.getLong(0)).toSeq
      ks == ks.sorted
    }
    assert(fileIsSorted(build(sortOnMerge = true)),
      "sortOnMerge=true must produce a globally sorted merged file")
    assert(!fileIsSorted(build(sortOnMerge = false)),
      "reference-parity default concatenates the sorted inputs")
    // content identical either way
    assert(build(sortOnMerge = true).read().count() == 1000)
  }

  test("recluster composes with a concurrent insert (MVCC)") {
    // same safety argument as insert-vs-optimize: recluster tombstones
    // exactly the files its snapshot read, an insert only ADDS files in a
    // fresh log — last-writer-wins-per-path folding keeps both commits
    val table = new IceTable(spark, tmpDir("recluster_mvcc"), IceTableConfig(
      partitionExpr = lit("p=all"),
      sortOrder = Seq("id"),
      statsColumn = Some("x")))
    val df = grid(1024)
    (0 until 4).foreach(s =>
      table.insert(df.where((col("id") / 256).cast("long") === s)))
    val z = ZOrder.zvalue(5,
      ZOrder.scaled(col("x"), 0, 1023, 5), ZOrder.scaled(col("y"), 0, 1023, 5))
    val extra = grid(1024).withColumn("id", col("id") + 10000)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val rec = Future(table.recluster(z, filesPer = 4,
      partitions = Some(Set("p=all"))))
    val ins = Future(table.insert(extra))
    Await.result(Future.sequence(Seq[Future[Any]](rec, ins)), 120.seconds)
    // nothing lost, regardless of which commit won the interleaving
    assert(table.read().count() == 2048)
  }

  test("recluster restricted to a partition subset leaves others alone") {
    val table = new IceTable(spark, tmpDir("recluster2"), IceTableConfig(
      partitionExpr = concat(lit("g="), pmod(col("id"), lit(2))),
      sortOrder = Seq("id"),
      statsColumn = Some("x")))
    val df = grid(1024)
    // consecutive bands hold both parities, so each insert writes BOTH
    // g=0 and g=1 partition files
    (0 until 4).foreach(s =>
      table.insert(df.where((col("id") / 256).cast("long") === s)))
    assert(table.snapshot().aliveFiles.length == 8) // 2 partitions x 4
    val z = ZOrder.zvalue(5,
      ZOrder.scaled(col("x"), 0, 1023, 5), ZOrder.scaled(col("y"), 0, 1023, 5))
    assert(table.recluster(z, filesPer = 2, partitions = Some(Set("g=0"))) == 1)
    val snap = table.snapshot()
    val byPart = snap.aliveFiles.groupBy(m => m.path.split("/")(1))
    assert(byPart("g=0").length == 2 && byPart("g=1").length == 4)
    assert(table.read().count() == 1024)
  }
}
