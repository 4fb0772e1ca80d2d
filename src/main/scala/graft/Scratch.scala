package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration.
  *
  * Current experiment: why did the b53 metadata-count rewrite fire in
  * Verify but not in the Plans dump? Reproduce both plan shapes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", Fixtures.scratchDir("graft_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    val t = Fixtures.lineitemIce(spark, sfDir)
    println("all rc? " + t.snapshot().aliveFiles.forall(_.rowCount.isDefined))
    val base = graft.plans.IceFileIndex.dataFrame(spark, t)
    val cnt = base.agg(count(lit(1)).as("cnt"))
    println("bare optimized: " + cnt.queryExecution.optimizedPlan.getClass.getName)
    println(cnt.queryExecution.optimizedPlan.toString.take(400))
    val withCol = cnt.withColumn("metadata_only", lit(true))
    println("withColumn optimized: " +
      withCol.queryExecution.optimizedPlan.toString.take(400))
    val full = SparkEntry.queries("b53_meta_count")(spark, sfDir)
    println("b53 optimized: " + full.queryExecution.optimizedPlan.toString.take(400))
    spark.stop()
  }
}
