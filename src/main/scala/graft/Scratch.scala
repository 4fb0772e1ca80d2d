package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration.
  *
  * Current experiment: where do llm_minhash_dedup's sf1 CPU-seconds go?
  * The pipeline has two halves with a hard materialization boundary
  * between them — the cached tok table (built + counted inside
  * minHashDupPairsPlanned) and everything derived from it (banding,
  * candidate pairing, exact verification). Timing the planned call vs
  * the result materialization splits CPU across that boundary. Run with
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 and SCRATCH_SF1=1 to
  * replicate the bench's synthesized sf1 documents (10 salted replicas).
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
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    val docs0 = Fixtures.raw(spark, sfDir, "documents")
    val docs =
      if (!sys.env.get("SCRATCH_SF1").contains("1")) docs0
      else {
        // the bench's sf1 synthesis for documents: 10 key-offset replicas,
        // replica 0 verbatim, others salted every 3rd word
        val off = 10_000_000L
        (0 until 10).map { i =>
          if (i == 0) docs0
          else docs0.withColumn("doc_id", col("doc_id") + lit(off * i))
            .withColumn("text", concat_ws(" ",
              transform(split(col("text"), " "), (w, ix) =>
                when(ix % 3 === 0, concat(lit(s"q${i}x"), w)).otherwise(w))))
        }.reduce(_ unionByName _).localCheckpoint()
      }
    println(s"docs=${docs.count()}")

    def timed[A](label: String)(f: => A): A = {
      val c0 = bean.getProcessCpuTime; val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (bean.getProcessCpuTime - c0) / 1e9
      println(f"$label%-28s wall=$wall%7.2f s  cpu=$cpu%7.2f s")
      r
    }

    // warmup at a small scale to take codegen out of the measurement
    operators.Dedup.minHashDupPairs(docs.limit(500), "doc_id", "text").count()

    (1 to 2).foreach { rep =>
      val (pairs, tok) = timed(s"rep$rep tok build (planned)") {
        operators.Dedup.minHashDupPairsPlanned(
          docs, "doc_id", "text", 0.8, 128, 16, 3, 1000)
      }
      timed(s"rep$rep band+pair+verify") { pairs.count() }
      tok.unpersist()
    }
    spark.stop()
  }
}
