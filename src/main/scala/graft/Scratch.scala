package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times one
  * operator in isolation at a given SF. Kept for local iteration. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Fixtures.raw(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count() // warm FS cache

    def time(name: String)(body: => Long): Unit = {
      body // warmup (codegen)
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$name: $n rows in $s%.3f s")
        s
      }
      println(f"$name best: ${times.min}%.3f s")
    }

    val t0 = System.nanoTime()
    val st = graft.operators.Search.docTermStats(docs, "doc_id", "text",
      Seq("spark", "query", "window"))
    println(f"docTermStats count=${st.count()} in ${(System.nanoTime() - t0) / 1e9}%.3f s")

    time("bm25TopK")(
      graft.operators.Search.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "query", "window"), k = 10).count())
    spark.stop()
  }
}
