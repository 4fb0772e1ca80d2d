package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration.
  *
  * Current experiment: llm_minhash_dedup CPU — BENCH showed 13 s CPU in
  * round 8 (min-of-reps) vs 30.6 s now (median-of-reps); time each rep
  * separately to see the per-rep distribution and find where CPU goes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.local.dir", Fixtures.scratchDir("graft_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timeReps(what: String, reps: Int)(run: () => Unit): Unit = {
      for (i <- 1 to reps) {
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        run()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"  $what%-28s rep$i wall=$wall%.3f cpu=$cpu%.3f")
      }
    }

    val qs = SparkEntry.queries
    timeReps("llm_minhash_dedup", 4)(() =>
      { qs("llm_minhash_dedup")(spark, sfDir).count(); () })
    // now interleave OTHER heavy queries between minhash reps, mimicking
    // the bench's all-queries-then-reps schedule: if CPU jumps back up,
    // the codegen class cache (default 100 entries) is being evicted and
    // janino recompiles the same stages
    val others = Seq("llm_semantic_dedup", "llm_ann_pq", "b15_datetime",
      "join_star_schema", "b11_topk", "llm_image_dedup", "llm_bm25_index")
    for (i <- 1 to 2) {
      others.foreach(n => { try qs(n)(spark, sfDir).count() catch { case _: Throwable => () } })
      timeReps(s"minhash after others#$i", 1)(() =>
        { qs("llm_minhash_dedup")(spark, sfDir).count(); () })
    }
    spark.stop()
  }
}
