package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration.
  *
  * Current experiment: decompose llm_ann_pq (the heaviest bench query —
  * 5.3 s wall / 26.6 s CPU at sf0.1 over only 2000 vectors, so the cost
  * is plan/stage overhead, not data) into its stages and time each.
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
      .config("spark.local.dir", Fixtures.scratchDir("graft_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timeIt(what: String)(run: () => Unit): Unit = {
      run() // warmup (codegen)
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"  $what%-28s wall=$wall%.3f cpu=$cpu%.3f")
    }

    val qs = SparkEntry.queries
    timeIt("full llm_ann_pq")(() => { qs("llm_ann_pq")(spark, sfDir).count(); () })
    timeIt("full llm_ann_bruteforce")(() =>
      { qs("llm_ann_bruteforce")(spark, sfDir).count(); () })

    // stage decomposition of the pqTopK inside the recall harness
    val emb = Fixtures.raw(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.where(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = emb.select(col("vec_id").as("id"), col("embedding").as("_v"))
    import graft.operators.Similarity
    timeIt("pqTrain (driver Lloyd)")(() =>
      { Similarity.pqTrain(c, 8, 32, 3, 64).count(); () })
    val codebook = Similarity.pqTrain(c, 8, 32, 3, 64)
    timeIt("pqEncode")(() =>
      { Similarity.pqEncode(c, codebook, 8, 64).count(); () })
    timeIt("full pqTopK")(() =>
      { Similarity.pqTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, m = 8, ksub = 32,
          iterations = 3, dim = 64, rerankFactor = 10).count(); () })
    spark.stop()
  }
}
