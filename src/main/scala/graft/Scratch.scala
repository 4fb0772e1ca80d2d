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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replicate the optimize_2000 bench in isolation
    val n = 6_000_000L
    val synthDf = spark.range(n).select(
      col("id").as("ts"),
      concat(lit("u"), pmod(col("id"), lit(1000))).as("user_id"),
      lit("page_load").as("event"),
      to_json(struct(col("id").as("n"))).as("properties"))
    val st = new graft.ice.IceTable(spark,
      java.nio.file.Files.createTempDirectory("graft_synth2").toString,
      graft.ice.IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("ts"), lit(16))),
        sortOrder = Seq("event", "ts"),
        shuffleOnInsert = false))
    var t0 = System.nanoTime()
    st.insert(synthDf.repartition(125))
    println(f"insert125: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val files = st.snapshot().aliveFiles.length
    println(s"files=$files")
    t0 = System.nanoTime()
    st.optimize(maxFileSize = 10_000_000_000L, maxFileCount = 1000)
    println(f"optimize_2000: ${(System.nanoTime() - t0) / 1e9}%.2f s; alive=${st.snapshot().aliveFiles.length}")
    spark.stop()
  }
}
