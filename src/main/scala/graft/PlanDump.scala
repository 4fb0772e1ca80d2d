package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round evidence tool: dumps `explain("formatted")` for the
  * named queries (default: the bench headline set) into an output dir, one
  * `<query>_<suffix>.txt` per query — the before/after plan artifacts the
  * optimization judge checks claims against.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r16")
    val suffix = args.lift(2).getOrElse("before")
    // default = the bench headline set (the perf contract surface)
    val benchHeadline = Seq(
      "a1_insert_count", "a10_merge_stability", "a18_partition_prune",
      "b2_partition_columns", "b5_filter", "b6_group_agg", "b7_count_distinct",
      "b10_quantiles", "b11_topk", "b12_json_extract", "b15_datetime",
      "join_star_schema", "llm_exact_dedup", "llm_token_stats",
      "llm_minhash_dedup", "llm_ann_bruteforce", "llm_span_dedup",
      "llm_ann_pq", "llm_semantic_dedup", "sessionize_events",
      "ts_gapfill", "llm_bm25_index", "llm_image_dedup", "b44_bucket_join")
    val names: Seq[String] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(benchHeadline)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    names.foreach { name =>
      try {
        // llm_minhash_dedup localCheckpoints its result (cache lifecycle),
        // which would print as an opaque RDD scan — plan the lazy internal
        // form instead (same convention as graft.Plans)
        val df = name match {
          case "llm_minhash_dedup" =>
            val (pairs, tok) = operators.Dedup.minHashDupPairsPlanned(
              Fixtures.raw(spark, sfDir, "documents"), "doc_id", "text",
              0.7, 128, 16, 3, 1000)
            try pairs finally tok.unpersist()
          case _ => qs(name)(spark, sfDir)
        }
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
