package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (round 16): isolates one bench
  * section at a time with internal phase timers. Not part of the library
  * surface. Usage: runMain graft.Prof <section> */
object Prof {
  private def cpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  def timeIt[A](label: String)(body: => A): A = {
    val c0 = cpuNs(); val t0 = System.nanoTime()
    val r = body
    val w = (System.nanoTime() - t0) / 1e9
    val c = (cpuNs() - c0) / 1e9
    println(f"[prof] $label%-40s wall=$w%8.3f cpu=$c%8.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("logfold")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    section match {
      case "logfold" => logfold(spark)
      case "mv" => mv(spark)
      case other => System.err.println(s"unknown section: $other")
    }
    spark.stop()
  }

  /** Replicates Bench's mv_full_reagg / mv_refresh_delta shapes with
    * phase timers around the externally-visible pieces. */
  private def mv(spark: SparkSession): Unit = {
    import graft.ice.{IceTable, IceTableConfig}
    import graft.operators.MvSync
    import org.apache.spark.sql.functions._
    val n = 24_000_000L
    def rows = spark.range(n).select(
      col("id"),
      pmod(col("id"), lit(1000)).cast("string").as("grp"),
      (col("id") % 97).as("v"))
    val baseRoot = Fixtures.newRoot("prof_mvbase")
    val mvRoot = Fixtures.newRoot("prof_mv")
    val base = new IceTable(spark, baseRoot, IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("id"), lit(16))),
      sortOrder = Seq("id")))
    timeIt("base insert 24M") { base.insert(rows) }
    val spec = MvSync.MvSpec(Seq("grp"),
      sumCols = Seq("v"), minMaxCols = Seq("id"))
    val mv = MvSync.create(spark, mvRoot, spec)
    Thread.sleep(5)
    timeIt("initial syncFromFeed") { MvSync.syncFromFeed(base, mv, spec) }
    // the pure re-agg a rebase must at least pay
    timeIt("bare reagg count") {
      base.read(Long.MaxValue).groupBy(col("grp"))
        .agg(count(lit(1)), sum(col("v")), min(col("id")), max(col("id")))
        .count()
    }
    (1 to 3).foreach { i =>
      Thread.sleep(2)
      timeIt(s"rebase rep $i") { MvSync.rebase(base, mv, spec) }
    }
    def delta = rows.where(pmod(col("id"), lit(1000)) === 0)
    var rep = 0L
    (1 to 3).foreach { i =>
      rep += 1
      timeIt(s"delta insert rep $i") {
        base.insert(delta.withColumn("id", col("id") + lit(rep * 10L * n)))
      }
      Thread.sleep(5)
      timeIt(s"refresh delta rep $i") { MvSync.syncFromFeed(base, mv, spec) }
    }
    timeIt("mv read") { MvSync.read(mv, spec).collect() }
    rm(new java.io.File(baseRoot)); rm(new java.io.File(mvRoot))
  }

  private def rm(dir: java.io.File): Unit = {
    Option(dir.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm)
    dir.delete(); ()
  }

  private def logfold(spark: SparkSession): Unit = {
    import graft.ice.{FileMarker, IceTable, IceTableConfig, Schema}
    import org.apache.spark.sql.functions.lit
    val root = Fixtures.scratchDir("prof_logbench20k")
    val t = new IceTable(spark, root, IceTableConfig(lit("p=1"), Seq.empty))
    val sch = Schema("ts" -> "BIGINT")
    val base = 1700000000000L
    timeIt("build 20k logs") {
      (0 until 20000).foreach { i =>
        t.logio.append(root, 1, sch,
          Seq(FileMarker(s"_data/p=1/a$i.parquet", base + i, 100L),
            FileMarker(s"_data/p=1/b$i.parquet", base + i, 100L)),
          timestamp = Some(base + i))
      }
    }
    (1 to 3).foreach { i =>
      timeIt(s"snapshot rep $i") {
        val snap = t.snapshot()
        require(snap.files.length == 40000)
      }
    }
    // phase split: list vs fetch vs fold
    (1 to 2).foreach { i =>
      val logs = timeIt(s"rep$i currentLogFiles") {
        t.logio.currentLogFiles(root) }
      val filtered = timeIt(s"rep$i filter by ts") {
        logs.filter(p => graft.ice.IceLogIO.logFileInfo(p)._1 < Long.MaxValue) }
      val fetched = timeIt(s"rep$i fetchLogLines") {
        t.logio.fetchLogLines(root, filtered.sorted) }
      timeIt(s"rep$i sequential fold") {
        val sorted = filtered.sorted
        sorted.foreach { lf => t.logio.parseLog(lf, fetched(lf)) }
      }
    }
    rm(new java.io.File(root))
  }
}
