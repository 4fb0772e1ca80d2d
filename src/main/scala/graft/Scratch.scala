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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val sf = "/root/testdata/sf0.1"
    Fixtures.lineitemIce(spark, sf) // untimed build
    val q = SparkEntry.queries("b11_topk")
    q(spark, sf).count() // warmup
    (0 until 3).foreach { i =>
      val c0 = osBean.getProcessCpuTime; val w0 = System.nanoTime()
      q(spark, sf).count()
      println(f"B11 rep$i wall=${(System.nanoTime() - w0) / 1e9}%.2f cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
