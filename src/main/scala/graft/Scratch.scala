package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration.
  *
  * Current experiment: the bloom_needle / nobloom_needle bench pair —
  * verify the written files actually carry bloom filters, and measure
  * wall, CPU, and BYTES READ for the needle query with and without them.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Fixtures.scratchDir("graft_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rm(dir: java.io.File): Unit = {
      Option(dir.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm)
      dir.delete(); ()
    }

    // track bytes read per query via a stage listener
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytesRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })

    import graft.ice.{IceTable, IceTableConfig}
    val n = 6_000_000L
    def build(bloom: Boolean, maxBytes: Option[Long] = None): (IceTable, String) = {
      val root = Fixtures.scratchDir("graft_bloom_scratch")
      maxBytes match {
        case Some(b) => spark.sparkContext.hadoopConfiguration
          .set("parquet.bloom.filter.max.bytes", b.toString)
        case None => spark.sparkContext.hadoopConfiguration
          .unset("parquet.bloom.filter.max.bytes")
      }
      val t = new IceTable(spark, root,
        IceTableConfig(lit("p=1"), Seq("ord"),
          bloomFilterColumns = if (bloom) Seq("id") else Seq.empty,
          bloomFilterNdv = if (bloom) Some(2_600_000L) else None))
      t.insert(spark.range(n).select(
        xxhash64(col("id")).as("id"),
        col("id").as("ord"),
        repeat(md5(col("id").cast("string")), 4).as("payload")))
      (t, root)
    }

    def inspect(t: IceTable): Unit = {
      val marker = t.snapshot().aliveFiles.head
      val path = new org.apache.hadoop.fs.Path(t.root, marker.path)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          path, spark.sparkContext.hadoopConfiguration))
      try {
        val blocks = reader.getFooter.getBlocks
        println(s"  file=${marker.path} rowGroups=${blocks.size()} bytes=${marker.fileBytes}")
        blocks.forEach { b =>
          println(s"    rg rows=${b.getRowCount}")
          b.getColumns.forEach { c =>
            println(s"      col=${c.getPath} enc=${c.getEncodings} codec=${c.getCodec} " +
              s"comp=${c.getTotalSize} raw=${c.getTotalUncompressedSize} " +
              s"bloomOff=${c.getBloomFilterOffset} dictOff=${c.getDictionaryPageOffset}")
          }
        }
      } finally reader.close()
    }

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timeNeedle(label: String, bloom: Boolean): Unit = {
      val (t, root) = build(bloom)
      inspect(t)
      val needle = spark.range(1).select(xxhash64(lit(424242L))).head.getLong(0)
      def run(): Long = t.read().where(col("id") === needle)
        .agg(count(lit(1)), max(col("payload"))).head.getLong(0)
      run() // warmup
      (1 to 3).foreach { i =>
        bytesRead.set(0)
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        require(run() >= 1L)
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"  $label rep$i wall=$wall%.3f cpu=$cpu%.3f bytesRead=${bytesRead.get() / 1e6}%.1f MB")
      }
      rm(new java.io.File(root))
    }

    // variant study: isolate where the cpu goes
    def study(label: String, bloom: Boolean, maxBytes: Option[Long]): Unit = {
      val (t, root) = build(bloom, maxBytes)
      inspect(t)
      val present = spark.range(1).select(xxhash64(lit(424242L))).head.getLong(0)
      val absent = spark.range(1).select(xxhash64(lit(987654321012L))).head.getLong(0)
      def timeIt(what: String)(run: () => Unit): Unit = {
        run()
        bytesRead.set(0)
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        run()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"  [$label] $what wall=$wall%.3f cpu=$cpu%.3f read=${bytesRead.get() / 1e6}%.1f MB")
      }
      timeIt("present+payload")(() =>
        assert(t.read().where(col("id") === present)
          .agg(count(lit(1)), max(col("payload"))).head.getLong(0) >= 1))
      timeIt("absent +payload")(() =>
        assert(t.read().where(col("id") === absent)
          .agg(count(lit(1)), max(col("payload"))).head.getLong(0) == 0))
      rm(new java.io.File(root))
    }
    // NOTE: withBloomOptions now sizes parquet.bloom.filter.max.bytes from
    // the declared ndv as a per-write option, which overrides the hadoop
    // conf — so the interesting comparison is auto-sized vs bloom-less
    // (the old 1MB-truncation case is only reachable without an ndv)
    study("bloomAuto", bloom = true, None)
    study("nobloom  ", bloom = false, None)
    spark.stop()
  }
}
