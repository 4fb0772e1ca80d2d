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

  test("string columns persist byte-length stats (avgLen/maxLen)") {
    val t = mkTable("ts_len")
    val s = TableStats.analyze(t)
    val sv = s.columns.find(_.column == "s").get
    // values are "v0".."v49": avg length between 2 and 3, max 3
    assert(sv.maxLen === Some(3L))
    assert(sv.avgLen.exists(l => l >= 2L && l <= 3L))
    // numeric columns carry no length stats (fixed width at plan time)
    assert(s.columns.find(_.column == "k").get.avgLen.isEmpty)
    // round-trips through the persisted JSON
    val back = TableStats.read(IceTable.open(spark, t.root)).get
    assert(back.columns.find(_.column == "s").get.maxLen === Some(3L))
  }

  test("persisted stats flip a sort-merge join to broadcast under CBO") {
    import graft.plans.IceFileIndex
    val dim = new IceTable(spark, tmpDir("cbo_dim"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    dim.insert(spark.range(20000).select(col("id"),
      pmod(col("id"), lit(1000)).as("cat"),
      concat(lit("payload_"), col("id"), lit("_x" * 8)).as("p")))
    val fact = new IceTable(spark, tmpDir("cbo_fact"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("fid")))
    fact.insert(spark.range(50000).select(col("id").as("fid"),
      pmod(col("id"), lit(20000)).as("did")))
    TableStats.analyze(dim) // fact deliberately NOT analyzed

    def withCbo[T](cbo: Boolean, threshold: String)(body: => T): T = {
      val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
      val savedTh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try body
      finally {
        spark.conf.set("spark.sql.cbo.enabled", savedCbo)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedTh)
      }
    }
    // self-calibrating threshold between the two modes' own estimates of
    // the join's dim subtree (column-pruned file bytes without CBO,
    // rows/ndv with) — SF/layout independent. sparkPlan is pre-AQE, so
    // the flip is the OPTIMIZER reading persisted stats, never runtime
    // sizes.
    def dimEstimate(cbo: Boolean): BigInt = withCbo(cbo, "-1") {
      IceFileIndex.dataFrame(spark, dim).where(col("cat") === 7)
        .select(col("id"), col("cat"))
        .queryExecution.optimizedPlan.stats.sizeInBytes
    }
    val eOn = dimEstimate(cbo = true)
    val eOff = dimEstimate(cbo = false)
    assert(eOn * 4 <= eOff,
      s"analyzed estimate ($eOn) must be far below the file-size one ($eOff)")
    val threshold = ((eOn + eOff) / 2).toString
    def joinKinds(cbo: Boolean): Set[String] = withCbo(cbo, threshold) {
      IceFileIndex.dataFrame(spark, fact)
        .join(IceFileIndex.dataFrame(spark, dim).where(col("cat") === 7),
          col("did") === col("id"))
        .groupBy(col("cat")).count()
        .queryExecution.sparkPlan.collect {
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
            "broadcast"
          case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            "sortmerge"
        }.toSet
    }
    assert(joinKinds(cbo = true) === Set("broadcast"),
      "analyzed dim must broadcast under CBO")
    assert(joinKinds(cbo = false) === Set("sortmerge"),
      "without CBO the file-size estimate must sort-merge")

    // the relation itself surfaces the persisted rowCount to the planner
    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = IceFileIndex.dataFrame(spark, dim)
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(20000)))
    } finally spark.conf.set("spark.sql.cbo.enabled", savedCbo)

    // stats are estimates only — results are identical either way
    assert(IceFileIndex.dataFrame(spark, fact)
      .join(IceFileIndex.dataFrame(spark, dim).where(col("cat") === 7),
        col("did") === col("id")).count() === 50L)
  }

  test("equi-height histogram: persisted, round-trips, sharpens skewed estimates") {
    val t = new IceTable(spark, tmpDir("ts_hist"), IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    // strongly right-skewed: v = id^2 / 1000 over id<1000 — half the rows
    // sit under max/4, where a uniform interpolation puts a quarter
    t.insert(spark.range(1000).select(col("id"),
      (col("id") * col("id") / 1000.0).as("v")))
    val s = TableStats.analyze(t, Seq("id", "v"),
      histogramColumns = Seq("v"), histogramBins = 16)
    val vs = s.columns.find(_.column == "v").get
    assert(vs.bins.exists(_.size === 16))
    val bins = vs.bins.get
    assert(bins.head.lo <= bins.head.hi && bins.last.hi >= 990.0)
    assert(bins.sliding(2).forall { case Seq(a, b) => a.hi <= b.lo + 1e-9 })
    // persisted: a fresh handle reads the same bins back
    val back = TableStats.read(new IceTable(spark, t.root,
      IceTableConfig(lit("all"), Seq("id")))).get
    assert(back.columns.find(_.column == "v").get.bins.get === bins)
    // the estimate flip: uniform puts `v <= max/4` at ~25%; the histogram
    // knows it is ~half. Compare optimizer rowCounts under CBO.
    def estimate(): BigInt = {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try graft.plans.IceFileIndex.dataFrame(spark, t)
        .where(col("v") <= 249.0)
        .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
      finally spark.conf.set("spark.sql.cbo.enabled", "false")
    }
    val histEst = estimate()
    TableStats.analyze(t, Seq("id", "v")) // re-analyze WITHOUT histogram
    val uniformEst = estimate()
    val trueN = BigInt(499) // id^2/1000 <= 249 ⇔ id <= 499
    assert((histEst - trueN).abs < (uniformEst - trueN).abs,
      s"hist $histEst should beat uniform $uniformEst against true $trueN")
    assert(histEst * 2 >= trueN && histEst <= trueN * 2,
      s"hist estimate $histEst not within 2x of $trueN")
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
