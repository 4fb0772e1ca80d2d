package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration. */
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
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def rm(dir: java.io.File): Unit = {
      Option(dir.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm)
      dir.delete(); ()
    }
    // isolate the insert_noshuffle bench: same shape as Bench.timedInsert
    val synthRows = 6_000_000L
    def synthDf = spark.range(synthRows).select(
      col("id").as("ts"),
      concat(lit("user_"), pmod(col("id"), lit(16))).as("user_id"),
      lit("page_load").as("event"),
      to_json(struct(col("id").as("n"))).as("properties"))
    (0 until 4).foreach { i =>
      val root = Fixtures.scratchDir("graft_synth")
      val st = new graft.ice.IceTable(spark, root,
        graft.ice.IceTableConfig(
          partitionExpr = concat(lit("u="), pmod(col("ts"), lit(16))),
          sortOrder = Seq("event", "ts"),
          shuffleOnInsert = false))
      val c0 = osBean.getProcessCpuTime; val w0 = System.nanoTime()
      st.insert(synthDf)
      println(f"NOSHUF rep$i wall=${(System.nanoTime() - w0) / 1e9}%.2f cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f")
      rm(new java.io.File(root))
    }
    spark.stop()
  }
}
