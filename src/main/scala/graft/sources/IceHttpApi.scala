package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ice.IceTable
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.collection.mutable

/** A22: the reference's HTTP ingest/query sidecar
  * (examples/api-flask.py:184-217, api-falcon.py) on the JDK's built-in
  * HTTP server — zero extra dependencies. Endpoints:
  *
  *  - `POST /insert` — body is NDJSON (one JSON object per line) or a JSON
  *    array; rows buffer in memory and flush as ONE atomic ice insert per
  *    interval (the reference's `IceDBBatcher` 3 s timer,
  *    examples/api-flask.py:51-141) or on `POST /flush`.
  *  - `POST /flush` — force the buffered batch out.
  *  - `GET /query?sql=...` — runs Spark SQL with the current snapshot
  *    registered as table `ice`; returns CSV (the reference's text/CSV
  *    output shapes, B23).
  *  - `GET /manifest[?ts=<epoch-ms>]` — the LIVE form of
  *    [[graft.ice.ManifestExport]]: the current (or time-traveled)
  *    snapshot's alive-file manifest as JSON, byte-identical to a static
  *    export of the same snapshot. A foreign engine polls this and reads
  *    the listed parquet directly — no log fold, no Spark involvement
  *    beyond this server (the reference's s3-proxy / ClickHouse
  *    `get_files` integration surface, README.md:29-31,
  *    ch/user_scripts/main.go:44-73, served instead of linked).
  *  - `GET /manifest.sql?view=<name>[&ts=<epoch-ms>]` — the ready-to-run
  *    DuckDB view over that snapshot (dv anti-join included):
  *    `curl … | duckdb` is a live foreign-engine query path.
  *
  * The buffer is driver-memory-bounded by design — it is an ingestion
  * *edge*; the data plane stays in Spark jobs. For production-scale
  * streams use Structured Streaming `foreachBatch` (StreamingIngestSpec).
  */
final class IceHttpApi(
    table: IceTable,
    flushIntervalMs: Long = 3000L,
    mergeIntervalMs: Long = 0L,
    maxQueryRows: Int = 10000) {

  private val buffer = mutable.ArrayBuffer.empty[String]
  private var server: HttpServer = _
  private var timer: ScheduledExecutorService = _
  private var pool: java.util.concurrent.ExecutorService = _
  private val spark = table.spark

  def start(port: Int = 0): InetSocketAddress = synchronized {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/insert", (ex: HttpExchange) => handle(ex) {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val lines =
        if (body.trim.startsWith("["))
          // JSON array → NDJSON via Spark's own parser downstream
          Seq(body)
        else body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      val n = synchronized { buffer ++= lines; buffer.length }
      (200, s"""{"buffered": $n}""")
    })
    server.createContext("/flush", (ex: HttpExchange) => handle(ex) {
      val n = flush()
      (200, s"""{"inserted_rows": $n}""")
    })
    server.createContext("/query", (ex: HttpExchange) => handle(ex) {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val sql = q.split("&").collectFirst {
        case kv if kv.startsWith("sql=") =>
          java.net.URLDecoder.decode(kv.drop(4), "UTF-8")
      }.getOrElse(badRequest(ex, "missing sql param"))
      table.read().createOrReplaceTempView("ice")
      val df = spark.sql(sql)
      val header = df.columns.mkString(",")
      // hard row cap: an HTTP edge must never pull an unbounded result
      // through the driver (take(n+1) detects truncation without a count)
      val taken = df.take(maxQueryRows + 1)
      val truncated = taken.length > maxQueryRows
      val rows = taken.take(maxQueryRows).map(_.toSeq.map {
        case null => ""
        case v => v.toString
      }.mkString(","))
      // truncation is signalled out-of-band: CSV has no comment syntax, so
      // an in-body marker line would parse as a malformed data row
      if (truncated) {
        ex.getResponseHeaders.set("X-Truncated", "true")
        ex.getResponseHeaders.set("X-Row-Limit", maxQueryRows.toString)
      }
      (200, (header +: rows.toSeq).mkString("\n"))
    })
    server.createContext("/manifest", (ex: HttpExchange) => handle(ex) {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      def param(k: String): Option[String] = q.split("&").collectFirst {
        case kv if kv.startsWith(s"$k=") =>
          java.net.URLDecoder.decode(kv.drop(k.length + 1), "UTF-8")
      }
      val ts = param("ts").flatMap(_.toLongOption).getOrElse(Long.MaxValue)
      if (ex.getRequestURI.getPath.endsWith("/manifest.sql") ||
          ex.getRequestURI.getPath.endsWith("manifest.sql")) {
        val view = param("view").getOrElse("ice_snapshot")
        require(view.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"unsafe view name: '$view'")
        (200, graft.ice.ManifestExport.duckDbViewSql(table, view, ts))
      } else (200, graft.ice.ManifestExport.manifestJson(table, ts)._1)
    })
    // non-daemon worker threads would outlive stop() and pin the JVM:
    // keep the pool so stop() can shut it down
    pool = Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.start()
    if (flushIntervalMs > 0) {
      timer = Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "ice-http-batcher"); t.setDaemon(true); t
      })
      timer.scheduleAtFixedRate(() => flushQuietly(),
        flushIntervalMs, flushIntervalMs, TimeUnit.MILLISECONDS)
      if (mergeIntervalMs > 0)
        timer.scheduleAtFixedRate(() => try table.merge() catch { case _: Exception => () },
          mergeIntervalMs, mergeIntervalMs, TimeUnit.MILLISECONDS)
    }
    server.getAddress
  }

  /** Drain the buffer as one atomic insert; returns rows inserted. */
  def flush(): Long = {
    val batch = synchronized { val b = buffer.toSeq; buffer.clear(); b }
    if (batch.isEmpty) return 0L
    import spark.implicits._
    // cache: both the count and the insert consume this JSON parse —
    // uncached it would parse the whole batch twice
    val df = spark.read.json(spark.createDataset(batch)).cache()
    try {
      val n = df.count()
      table.insert(df)
      n
    } finally df.unpersist()
  }

  private def flushQuietly(): Unit =
    try flush() catch { case e: Exception =>
      System.err.println(s"[ice-http] flush failed: ${e.getMessage}") }

  private def jsonEscape(s: String): String =
    Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def handle(ex: HttpExchange)(f: => (Int, String)): Unit =
    try {
      val (code, body) = f
      respond(ex, code, body)
    } catch {
      case e: Exception =>
        respond(ex, 500, s"""{"error": "${jsonEscape(e.getMessage)}"}""")
    } finally ex.close()

  private def badRequest(ex: HttpExchange, msg: String): Nothing = {
    respond(ex, 400, s"""{"error": "${jsonEscape(msg)}"}""")
    throw new IllegalArgumentException(msg)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    try {
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    } catch { case _: java.io.IOException => () } // already responded
  }

  def stop(): Unit = synchronized {
    if (timer != null) timer.shutdownNow()
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdownNow()
  }
}
