package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ice.IceTable
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

/** The reference's "S3 proxy" integration surface
  * (/root/reference/README.md:29-31): a VIRTUAL BUCKET any S3-speaking
  * engine can point at with zero client code — `ListObjectsV2` returns
  * exactly the current snapshot's alive data files, `GET`/`HEAD` stream
  * the immutable parquet bytes (with `Range` support, which parquet
  * readers need for footer-first access) — so a foreign engine's
  * `s3('…/**/*.parquet')` glob reads a CONSISTENT MVCC snapshot without
  * knowing the log exists. The manifest endpoints ([[IceHttpApi]]) are
  * the "client fetches a file list" integration; this is the "client
  * changes nothing at all" one.
  *
  * Shape and scale:
  *  - LIST is ONE driver-side log fold (the same cost as any snapshot),
  *    never a filesystem listing — sizes come from the markers;
  *  - the listing is paged S3-style (`max-keys`, `continuation-token` =
  *    last key returned, start-after semantics), so 10⁵-file snapshots
  *    page exactly like a real bucket;
  *  - GET streams straight from storage with zero buffering of the whole
  *    object; ranged reads send only the requested window.
  *
  * Consistency contract: each LIST pins the snapshot AT THAT REQUEST;
  * data files are immutable, so a GET of a listed key stays valid across
  * later commits until a tombstone cleanup's retention reclaims it (the
  * same read-after-list window every MVCC manifest consumer gets). GETs
  * are served for any on-disk `_data/` path, so a list-then-read race
  * with compaction never 404s mid-query.
  *
  * Merge-on-read caveat, stated loudly: the proxy serves the FILE layer.
  * A table with LIVE deletion-vector marks over-serves the dv-dead rows
  * (raw parquet cannot carry an anti-join); run
  * [[graft.ice.DeleteVectors.materialize]] before exposing such a table,
  * or hand dv-aware clients the `/manifest.sql` view instead.
  *
  * Reference analog: README.md:29-31 sketches the same proxy idea over
  * its log; implementation here is original (JDK HttpServer, no deps).
  */
final class IceS3Proxy(table: IceTable, maxKeysCap: Int = 1000,
    chaosEveryN: Int = 0, chaosMax: Int = Int.MaxValue) {

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Fault injection for client retry tests: when `chaosEveryN` > 0,
    * every Nth data GET is truncated mid-body (half the declared bytes,
    * then the exchange is torn down) — the connection-level failure class
    * (reaped keep-alives, mid-transfer resets) every production S3 client
    * must absorb with idempotent retries (reference icedb/s3.py's
    * `retries=Retry(3)` config; our [[GraftS3FileSystem.send]]). */
  private val chaosCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  /** How many GETs were deliberately truncated (test observability). */
  def chaosHits: Int = chaosInjected.get()
  private val chaosInjected = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The virtual bucket name = the table's directory name. */
  val bucket: String = new java.io.File(table.root).getName

  def start(port: Int = 0): InetSocketAddress = synchronized {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    // daemon workers: a proxy left running (fixtures register a shutdown
    // hook, not an eager stop) must never pin the JVM open after main
    // returns — non-daemon pool threads did exactly that to Verify
    pool = Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "s3-proxy"); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.start()
    server.getAddress
  }

  def stop(): Unit = synchronized {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdownNow()
  }

  // ------------------------------------------------------------- routing

  private def route(ex: HttpExchange): Unit = {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val (bkt, key) = path.split("/", 2) match {
        case Array(b) => (b, "")
        case Array(b, k) => (b, k)
      }
      if (bkt != bucket)
        respondXml(ex, 404, errorXml("NoSuchBucket", s"no such bucket: $bkt"))
      else if (key.isEmpty) ex.getRequestMethod match {
        case "HEAD" => respondBytes(ex, 200, Array.empty, head = true)
        case _ => listObjects(ex)
      }
      else ex.getRequestMethod match {
        case "HEAD" => getObject(ex, key, headOnly = true)
        case "GET" => getObject(ex, key, headOnly = false)
        case m => respondXml(ex, 405,
          errorXml("MethodNotAllowed", s"method $m not allowed"))
      }
    } catch {
      case e: Exception =>
        // headers may already be on the wire (a failure mid-stream):
        // sending a second status line would throw inside the handler and
        // kill the keep-alive connection for the NEXT request too — log
        // and close instead; the truncated body already signals failure
        System.err.println(s"[s3-proxy] ${ex.getRequestMethod} " +
          s"${ex.getRequestURI}: ${e.getClass.getName}: ${e.getMessage}")
        try respondXml(ex, 500, errorXml("InternalError",
          Option(e.getMessage).getOrElse(e.getClass.getName)))
        catch { case _: Exception => () }
    } finally ex.close()
  }

  // ---------------------------------------------------------------- LIST

  private def queryParam(ex: HttpExchange, k: String): Option[String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").collectFirst {
      case kv if kv.startsWith(s"$k=") =>
        java.net.URLDecoder.decode(kv.drop(k.length + 1), "UTF-8")
    }

  private def listObjects(ex: HttpExchange): Unit = {
    val prefix = queryParam(ex, "prefix").getOrElse("")
    val startAfter = queryParam(ex, "continuation-token")
      .orElse(queryParam(ex, "start-after")).getOrElse("")
    // clamp like S3: max-keys=0 (or negative) is a valid request that
    // returns an empty, non-truncated listing — never a 500
    val maxKeys = math.max(0, math.min(maxKeysCap,
      queryParam(ex, "max-keys").flatMap(_.toIntOption).getOrElse(1000)))
    val delimiter = queryParam(ex, "delimiter").filter(_.nonEmpty)
    // snapshot time travel: `?ts=<epoch-ms>` lists the bucket AS OF that
    // time (the same strict-`<` bound as IceTable.snapshot / the manifest
    // endpoint) — a foreign engine replays any historical layout with a
    // query parameter and zero graft code
    val asOfTs = queryParam(ex, "ts").flatMap(_.toLongOption)
      .getOrElse(Long.MaxValue)
    // ONE log fold; keys sorted so paging is deterministic
    val snap = table.snapshot(asOfTs)
    val all = snap.aliveFiles.map(m => (m.path, m.fileBytes, m.createdMs))
      .filter { case (p, _, _) => p.startsWith(prefix) }
      .sortBy(_._1)
    // S3 delimiter semantics: keys with `delimiter` past the prefix roll
    // up into one CommonPrefixes entry each (the "directory" view a
    // hierarchical client pages with); rolled-up prefixes count toward
    // max-keys exactly like keys, and paging walks the MERGED sorted
    // stream of both entry kinds
    sealed trait Entry { def sortKey: String }
    final case class KeyE(p: String, bytes: Long, ms: Long) extends Entry {
      def sortKey: String = p }
    final case class PrefixE(p: String) extends Entry { def sortKey: String = p }
    val entries: Seq[Entry] = delimiter match {
      case None => all.map((KeyE.apply _).tupled)
      case Some(d) =>
        val grouped = all.map { case (p, bytes, ms) =>
          val rest = p.drop(prefix.length)
          val i = rest.indexOf(d)
          if (i < 0) KeyE(p, bytes, ms)
          else PrefixE(prefix + rest.take(i + d.length))
        }
        // dedup rolled-up prefixes, keep first occurrence order (sorted)
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        grouped.filter {
          case PrefixE(p) => seen.add(p)
          case _ => true
        }
    }
    val afterFiltered =
      if (startAfter.isEmpty) entries
      else entries.dropWhile(_.sortKey <= startAfter)
    val page = afterFiltered.take(maxKeys)
    val truncated = maxKeys > 0 && afterFiltered.length > maxKeys
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
    val contents = page.collect { case KeyE(p, bytes, ms) =>
      s"<Contents><Key>${xmlEscape(p)}</Key>" +
        s"<LastModified>${fmt.format(java.time.Instant.ofEpochMilli(ms))}</LastModified>" +
        s"""<ETag>&quot;${java.lang.Long.toHexString(ms ^ bytes)}&quot;</ETag>""" +
        s"<Size>$bytes</Size><StorageClass>STANDARD</StorageClass></Contents>"
    }.mkString
    val prefixes = page.collect { case PrefixE(p) =>
      s"<CommonPrefixes><Prefix>${xmlEscape(p)}</Prefix></CommonPrefixes>"
    }.mkString
    val next =
      if (truncated)
        s"<NextContinuationToken>${xmlEscape(page.last.sortKey)}</NextContinuationToken>"
      else ""
    respondXml(ex, 200,
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">""" +
        s"<Name>${xmlEscape(bucket)}</Name><Prefix>${xmlEscape(prefix)}</Prefix>" +
        delimiter.fold("")(d => s"<Delimiter>${xmlEscape(d)}</Delimiter>") +
        s"<KeyCount>${page.length}</KeyCount><MaxKeys>$maxKeys</MaxKeys>" +
        s"<IsTruncated>$truncated</IsTruncated>$next$contents$prefixes</ListBucketResult>")
  }

  // ----------------------------------------------------------------- GET

  private def getObject(ex: HttpExchange, key: String, headOnly: Boolean): Unit = {
    // traversal-proof: only normalized keys under _data/ are servable
    val norm = java.nio.file.Paths.get(key).normalize().toString
    if (norm != key || !key.startsWith("_data/") || key.contains("..")) {
      respondXml(ex, 404, errorXml("NoSuchKey", s"no such key: $key")); return
    }
    val fs = table.logio.fs(table.root)
    val p = new org.apache.hadoop.fs.Path(table.root, key)
    val st =
      try fs.getFileStatus(p)
      catch {
        case _: java.io.FileNotFoundException =>
          respondXml(ex, 404, errorXml("NoSuchKey", s"no such key: $key"))
          return
      }
    // a real bucket has no directories: a key that resolves to a
    // filesystem DIRECTORY (a partition level like `_data/u=0`) is not an
    // object. Answering 200 here made hierarchical clients treat the
    // directory as a data file, then die mid-GET on open("…/u=0") — they
    // must get 404 and fall back to a delimiter LIST like they would on S3
    if (st.isDirectory) {
      respondXml(ex, 404, errorXml("NoSuchKey", s"not an object: $key"))
      return
    }
    val len = st.getLen
    ex.getResponseHeaders.set("Accept-Ranges", "bytes")
    ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
    val range = Option(ex.getRequestHeaders.getFirst("Range"))
      .map(parseRange(_, len)).getOrElse(RangeIgnore) match {
      case RangeUnsatisfiable =>
        // S3 / RFC 7233: syntactically valid but unsatisfiable (start
        // past EOF, end before start, zero-length suffix) is 416
        // InvalidRange with the total size in Content-Range — serving
        // the full object here would hand a client reading against a
        // stale cached length the whole file as if it were the window
        ex.getResponseHeaders.set("Content-Range", s"bytes */$len")
        if (headOnly) { ex.sendResponseHeaders(416, -1); return }
        respondXml(ex, 416, errorXml("InvalidRange",
          s"the requested range is not satisfiable (object size $len)"))
        return
      case RangeAt(a, b) => Some((a, b))
      case RangeIgnore => None // malformed header: ignored, full object
    }
    if (headOnly) {
      // JDK 15+ (JDK-8242274): for a HEAD request the server honors a
      // handler-set Content-Length header with responseLength -1 (no
      // body) — the real size is exactly what S3 clients HEAD for
      // (object size before ranged footer reads). A ranged HEAD answers
      // like the ranged GET it sizes: 206 + Content-Range + the range's
      // own length.
      range match {
        case Some((a, b)) =>
          ex.getResponseHeaders.set("Content-Range", s"bytes $a-$b/$len")
          ex.getResponseHeaders.set("Content-Length", (b - a + 1).toString)
          ex.sendResponseHeaders(206, -1)
        case None =>
          ex.getResponseHeaders.set("Content-Length", len.toString)
          ex.sendResponseHeaders(200, -1)
      }
      return
    }
    val (off, n, code) = range match {
      case Some((a, b)) =>
        ex.getResponseHeaders.set("Content-Range", s"bytes $a-$b/$len")
        (a, b - a + 1, 206)
      case None => (0L, len, 200)
    }
    ex.sendResponseHeaders(code, n)
    // fault injection: declare n bytes, deliver ⌈n/2⌉, tear the exchange
    // down — the client sees a mid-transfer EOF and must retry. Capped at
    // `chaosMax` total injections; a cap BELOW the client's retry budget
    // makes overall success deterministic even if every injection lands
    // on one fetch's successive attempts
    // atomic claim of a chaos slot: a check-then-increment would let two
    // concurrent handlers both observe cap-1 and overshoot the cap — the
    // determinism argument above needs the cap to be exact
    def claimChaosSlot(): Boolean = {
      var cur = chaosInjected.get()
      while (cur < chaosMax) {
        if (chaosInjected.compareAndSet(cur, cur + 1)) return true
        cur = chaosInjected.get()
      }
      false
    }
    val chaos = chaosEveryN > 0 &&
      chaosCounter.incrementAndGet() % chaosEveryN == 0 &&
      claimChaosSlot()
    val toSend = if (chaos) (n + 1) / 2 else n
    val in = fs.open(p)
    try {
      if (off > 0) in.seek(off)
      val out = ex.getResponseBody
      val buf = new Array[Byte](64 * 1024)
      var remaining = toSend
      while (remaining > 0) {
        val r = in.read(buf, 0, math.min(buf.length, remaining).toInt)
        if (r < 0) remaining = 0
        else { out.write(buf, 0, r); remaining -= r }
      }
    } finally in.close()
  }

  private sealed trait RangeResult
  private final case class RangeAt(start: Long, end: Long) extends RangeResult
  /** Syntactically valid, cannot be satisfied against this object → 416. */
  private case object RangeUnsatisfiable extends RangeResult
  /** Malformed header → ignored, full object at 200 (RFC 7233 §3.1). */
  private case object RangeIgnore extends RangeResult

  /** `bytes=a-b` / `bytes=a-` / `bytes=-suffix` → inclusive (start, end).
    * The satisfiability split matters to real clients: a parquet reader
    * footer-seeking past a stale cached length must get 416 (and re-HEAD),
    * never silently the whole object. */
  private def parseRange(h: String, len: Long): RangeResult = {
    if (!h.startsWith("bytes=")) return RangeIgnore
    h.stripPrefix("bytes=").split("-", 2) match {
      case Array("", suf) => suf.toLongOption match {
        case Some(n) if n > 0 && len > 0 => RangeAt(math.max(0L, len - n), len - 1)
        case Some(_) => RangeUnsatisfiable // zero suffix, or empty object
        case None => RangeIgnore
      }
      case Array(a, "") => a.toLongOption match {
        case Some(s) if s < len => RangeAt(s, len - 1)
        case Some(_) => RangeUnsatisfiable // start at/past EOF
        case None => RangeIgnore
      }
      case Array(a, b) => (a.toLongOption, b.toLongOption) match {
        case (Some(s), Some(e)) if s <= e && s < len =>
          RangeAt(s, math.min(e, len - 1))
        case (Some(_), Some(_)) => RangeUnsatisfiable // inverted or past EOF
        case _ => RangeIgnore
      }
      case _ => RangeIgnore
    }
  }

  // ------------------------------------------------------------- helpers

  private def xmlEscape(s: String): String = s.flatMap {
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '&' => "&amp;"
    case '"' => "&quot;"
    case c => c.toString
  }

  private def errorXml(code: String, msg: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?><Error><Code>$code</Code>""" +
      s"<Message>${xmlEscape(msg)}</Message></Error>"

  private def respondXml(ex: HttpExchange, code: Int, body: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/xml")
    respondBytes(ex, code, body.getBytes(StandardCharsets.UTF_8))
  }

  private def respondBytes(ex: HttpExchange, code: Int, bytes: Array[Byte],
      head: Boolean = false): Unit =
    try {
      if (head) ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, math.max(bytes.length.toLong, 0L))
        ex.getResponseBody.write(bytes)
      }
    } catch { case _: java.io.IOException => () }
}
