package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANALYZE-style persisted column statistics: exact + HLL++ ndv,
  * latest-wins persistence across handles, defaults/validation, and the
  * empty-TVF edge. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(tag: String): IceTable = {
    val t = new IceTable(spark, tmpDir(tag), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    t.insert(spark.range(1000).select(col("id"),
      pmod(col("id"), lit(97)).as("k"),
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("v"), pmod(col("id"), lit(50)))).as("s"),
      array(col("id")).as("arr")))
    t
  }

  test("exact analyze matches ground truth; survives reopen; latest wins") {
    val t = mkTable("ts_exact")
    val s = TableStats.analyze(t, Seq("k", "s"), exact = true)
    assert(s.rowCount === 1000L)
    val k = s.columns.find(_.column == "k").get
    assert(k.ndv === 97L && k.nullCount === 0L)
    assert(k.min === Some("0") && k.max === Some("96"))
    val sv = s.columns.find(_.column == "s").get
    // id%50 ∈ {0,10,20,30,40} only occurs on id%10==0 rows (nulled), so
    // exactly 45 of the 50 candidate values exist
    assert(sv.ndv === 45L && sv.nullCount === 100L)
    // a fresh handle reads the persisted stats
    val reopened = IceTable.open(spark, t.root)
    assert(TableStats.read(reopened).map(_.rowCount) === Some(1000L))
    // re-analyze after more data: the NEWEST stats win
    t.insert(spark.range(1000, 1500).select(col("id"),
      pmod(col("id"), lit(97)).as("k"), lit("x").as("s"),
      array(col("id")).as("arr")))
    Thread.sleep(3)
    val s2 = TableStats.analyze(t, Seq("k"), exact = true)
    assert(s2.rowCount === 1500L)
    assert(TableStats.read(t).map(_.rowCount) === Some(1500L))
    // back-to-back same-millisecond analyses both persist (filename bump)
    TableStats.analyze(t, Seq("k"))
    TableStats.analyze(t, Seq("k"))
    assert(TableStats.read(t).isDefined)
  }

  test("analyze over an empty snapshot persists zero stats, null-free") {
    val t = mkTable("ts_empty")
    DeleteVectors.deleteWhere(t, lit(true))
    val s = TableStats.analyze(t, Seq("k"), exact = true)
    assert(s.rowCount === 0L)
    val k = s.columns.head
    assert(k.ndv === 0L && k.nullCount === 0L)
    assert(k.min.isEmpty && k.max.isEmpty) // None, not ""
  }

  test("default columns skip arrays; HLL ndv is within 10%; validation") {
    val t = mkTable("ts_approx")
    val s = TableStats.analyze(t) // default: every SCALAR column
    assert(s.columns.map(_.column).toSet === Set("id", "k", "s"))
    assert(!s.exact)
    val k = s.columns.find(_.column == "k").get
    assert(math.abs(k.ndv - 97L) <= 10, s"hll ndv ${k.ndv}")
    val e = intercept[IllegalArgumentException] {
      TableStats.analyze(t, Seq("nope"))
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("table_stats TVF + ANALYZE statement; never-analyzed is empty") {
    val t = mkTable("ts_sql")
    val f = new java.io.File(t.root)
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
    assert(spark.sql(s"SELECT * FROM table_stats('${f.getName}')").count() === 0L)
    val out = spark.sql(s"ANALYZE TABLE graft.`${f.getName}` " +
      "COMPUTE STATISTICS FOR COLUMNS k EXACT").collect()
    assert(out.length === 1 && out.head.getLong(1) === 97L)
    val tvf = spark.sql(
      s"SELECT column, ndv, row_count, exact FROM table_stats('${f.getName}')")
      .head
    assert(tvf.getString(0) === "k" && tvf.getLong(1) === 97L &&
      tvf.getLong(2) === 1000L && tvf.getBoolean(3))
  }
}
