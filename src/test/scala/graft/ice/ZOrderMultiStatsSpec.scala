package graft.ice

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Z-order clustering + multi-column log-side stats: every clustered
  * dimension gets a bounded per-file range, so range predicates on ANY of
  * them prune files from the log alone — the OPTIMIZE-ZORDER capability,
  * Spark-shaped.
  */
class ZOrderMultiStatsSpec extends SparkSpec {
  import spark.implicits._

  test("InterleaveBits: exact Morton values and null propagation") {
    val df = Seq((3L, 1L), (0L, 0L), (2L, 3L)).toDF("x", "y")
      .select(ZOrder.zvalue(2, col("x"), col("y")).as("z"))
    // bit i of dim j → output bit i*2+j:
    // (3,1): x bits {0,1}→out{0,2}, y bit {0}→out{1} = 0b0111 = 7
    // (2,3): x bit {1}→out{2}, y bits {0,1}→out{1,3} = 0b1110 = 14
    assert(df.as[Long].collect().toSeq == Seq(7L, 0L, 14L))

    val withNull = Seq((Some(1L), Some(1L)), (None, Some(2L)))
      .toDF("x", "y")
      .select(ZOrder.zvalue(4, col("x"), col("y")).as("z"))
    assert(withNull.collect().map(r => r.isNullAt(0)).toSeq == Seq(false, true))
  }

  test("scaled clamps out-of-range and maps [lo,hi] onto [0, 2^bits)") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
      .select(ZOrder.scaled(col("v"), 0, 100, 4).as("s"))
    val got = df.as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 7L, 15L, 15L), got)
  }

  test("multi-stats markers round-trip through log json with sorted keys") {
    val m = FileMarker("_data/p=1/x.parquet", 123L, 456L,
      stats = Some(("0", "9")),
      multiStats = Map("b" -> ("1", "8"), "a" -> ("2", "7")))
    val line = m.json
    // deterministic bytes: stm keys sorted
    assert(line.contains("\"stm\": {\"a\": [\"2\", \"7\"], \"b\": [\"1\", \"8\"]}"), line)
    val back = FileMarker.fromJson(line)
    assert(back.stats == m.stats && back.multiStats == m.multiStats)
    // stats-less markers keep the reference's exact byte shape
    val plain = FileMarker("_data/p=1/y.parquet", 1L, 2L)
    assert(!plain.json.contains("stm") && !plain.json.contains("st"))
  }

  test("insertClustered + statsColumns: both dimensions prune files") {
    // two independent dimensions (a full 64×64 grid) — a linear sort on x
    // gives y the full range in every file; z-order bounds both
    val n = 4096
    val df = (0 until n).map { i =>
      val x = (i % 64).toLong * 64
      val y = (i / 64).toLong * 64
      (x, y, i.toLong)
    }.toDF("x", "y", "id")
    val table = new IceTable(spark, tmpDir("zorder"), IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("x"),
      statsColumn = Some("x"),
      statsColumns = Seq("y")))
    val z = ZOrder.zvalue(6,
      ZOrder.scaled(col("x"), 0, n - 1, 6),
      ZOrder.scaled(col("y"), 0, n - 1, 6))
    table.insertClustered(df, z, numFiles = 16)

    val snap = table.snapshot()
    assert(snap.aliveFiles.length == 16, snap.aliveFiles.length)
    assert(snap.aliveFiles.forall(m =>
      m.stats.isDefined && m.multiStats.contains("y")))

    // pruning on BOTH dims: an eighth-range window on either dimension
    // must skip most files (z-order with 6 bits/dim bounds each file to a
    // fraction of each axis)
    val (lox, hix) = (0L, (n / 8 - 1).toLong)
    val xs = table.filesMatchingStats(snap,
      Map("x" -> (Some(lox.toString), Some(hix.toString))))
    val ys = table.filesMatchingStats(snap,
      Map("y" -> (Some(lox.toString), Some(hix.toString))))
    assert(xs.length < 16, s"x-window kept ${xs.length}")
    assert(ys.length < 16, s"y-window kept ${ys.length}")

    // conjunctive window: at most min of the two
    val both = table.filesMatchingStats(snap, Map(
      "x" -> (Some(lox.toString), Some(hix.toString)),
      "y" -> (Some(lox.toString), Some(hix.toString))))
    assert(both.length <= math.min(xs.length, ys.length))

    // pruned reads agree exactly with full-scan filters
    val full = table.read()
      .where(col("x").between(lox, hix)).agg(sum("id")).as[Long].head()
    val prunedSum = table.readFiles(snap, xs)
      .where(col("x").between(lox, hix)).agg(sum("id")).as[Long].head()
    assert(full == prunedSum)
    val fullY = table.read()
      .where(col("y").between(lox, hix)).agg(sum("id")).as[Long].head()
    val prunedY = table.readFiles(snap, ys)
      .where(col("y").between(lox, hix)).agg(sum("id")).as[Long].head()
    assert(fullY == prunedY)
  }

  test("SQL path prunes on the SECOND stats column via IceFileIndex") {
    val df = (0 until 256).map { i => // 16×16 grid
      val x = (i % 16).toLong * 16
      val y = (i / 16).toLong * 16
      (x, y, i.toLong)
    }.toDF("x", "y", "id")
    val table = new IceTable(spark, tmpDir("zorder_sql"), IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("x"),
      statsColumn = Some("x"),
      statsColumns = Seq("y")))
    val z = ZOrder.zvalue(4,
      ZOrder.scaled(col("x"), 0, 255, 4),
      ZOrder.scaled(col("y"), 0, 255, 4))
    table.insertClustered(df, z, numFiles = 8)
    graft.plans.IceFileIndex.registerView(spark, table, "ice_z")

    val q = spark.sql("select count(*) as cnt from ice_z where y between 0 and 31")
    val expected = df.where(col("y").between(0, 31)).count()
    assert(q.as[Long].head() == expected)
    val scans = q.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    val selected = scans.head.relation.location
      .listFiles(scans.head.partitionFilters, scans.head.dataFilters)
      .flatMap(_.files)
    assert(selected.length < 8,
      s"y-window should prune files, listed ${selected.length}")
  }
}
