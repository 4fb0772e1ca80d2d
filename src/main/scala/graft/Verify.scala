package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.concurrent.duration._

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened so a single bad fixture or query can never zero the round:
  * oracle_sql.json is written FIRST (before any Spark job), prewarm is
  * bounded, and every query runs in its own job group with a timeout +
  * cancel — a hang costs only that query's row.
  */
object Verify {

  private val queryPool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "verify-query"); t.setDaemon(true); t
      }))

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (fast local iteration)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).toSet)
    // default matches the stated environment (local[32]); the driver can
    // still override. Thread count never affects correctness, only how
    // close each query stays to its timeout.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val queryTimeout =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong.seconds
    val prewarmTimeout =
      sys.env.getOrElse("SPARK_GRAFT_PREWARM_TIMEOUT_SEC", "1800").toLong.seconds
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS): read as epoch-nanos BIGINT
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 150+ distinct query plans: keep their generated classes cached
      // instead of re-compiling past the 100-entry default (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // Oracle SQL goes to disk before any Spark job runs: a later hang or
    // crash must leave every already-flushed query output gradeable.
    writeOracleSql(outDir)

    try Fixtures.prewarm(spark, sfDir, prewarmTimeout)
    catch { case e: Throwable =>
      System.err.println(s"[verify] prewarm failed: ${e.getMessage}") }

    implicit val ec: ExecutionContext = queryPool
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val fut = Future {
        // job group is thread-local: set it inside the worker so a timeout
        // can cancel exactly this query's jobs (interruptOnCancel kills the
        // task threads, not just the scheduler entries)
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        finally spark.sparkContext.clearJobGroup()
      }
      try {
        Await.result(fut, queryTimeout)
        System.err.println(f"[verify] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      } catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[verify] $name TIMED OUT after $queryTimeout")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  private def writeOracleSql(outDir: String): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
