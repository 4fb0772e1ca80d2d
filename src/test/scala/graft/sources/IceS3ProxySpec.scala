package graft.sources

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._

/** The S3-proxy facade: a foreign engine doing nothing but paged
  * ListObjectsV2 + (ranged) GETs against the virtual bucket must
  * reconstruct the snapshot byte-for-byte. */
class IceS3ProxySpec extends SparkSpec {
  import spark.implicits._

  private def mk(): IceTable = {
    val t = new IceTable(spark, tmpDir("s3proxy"),
      IceTableConfig(
        partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))),
        sortOrder = Seq("id")))
    t.insert((1 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.insert((61 to 90).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t
  }

  private val client = HttpClient.newHttpClient()
  private def get(url: String, headers: (String, String)*): HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }
  private def keysOf(xml: String): Seq[String] =
    "<Key>([^<]+)</Key>".r.findAllMatchIn(xml).map(_.group(1)).toSeq
  private def sizesOf(xml: String): Seq[Long] =
    "<Size>([0-9]+)</Size>".r.findAllMatchIn(xml).map(_.group(1).toLong).toSeq

  test("paged LIST + GET reconstructs the snapshot byte-for-byte") {
    val t = mk()
    val proxy = new IceS3Proxy(t)
    val addr = proxy.start()
    val base = s"http://localhost:${addr.getPort}/${proxy.bucket}"
    try {
      // paged listing (max-keys=2): all pages concatenated = the
      // snapshot's alive files, sizes from the markers
      var keys = Vector.empty[String]
      var sizes = Vector.empty[Long]
      var token = ""
      var pages = 0
      var done = false
      while (!done) {
        val url = s"$base?list-type=2&max-keys=2" +
          (if (token.nonEmpty)
            s"&continuation-token=${java.net.URLEncoder.encode(token, "UTF-8")}"
           else "")
        val r = get(url)
        assert(r.statusCode() === 200)
        val xml = new String(r.body(), "UTF-8")
        keys ++= keysOf(xml); sizes ++= sizesOf(xml); pages += 1
        val next = "<NextContinuationToken>([^<]+)</NextContinuationToken>".r
          .findFirstMatchIn(xml).map(_.group(1))
        done = next.isEmpty
        next.foreach(token = _)
      }
      val snapFiles = t.snapshot().aliveFiles
      assert(pages > 1, "paging must actually page")
      assert(keys.sorted === snapFiles.map(_.path).sorted)
      assert(keys.zip(sizes).toMap ===
        snapFiles.map(m => m.path -> m.fileBytes).toMap)

      // prefix narrows to one partition
      val pfx = get(s"$base?list-type=2&prefix=_data/p=1/")
      val pKeys = keysOf(new String(pfx.body(), "UTF-8"))
      assert(pKeys.nonEmpty && pKeys.forall(_.startsWith("_data/p=1/")))
      assert(pKeys.sorted ===
        snapFiles.map(_.path).filter(_.startsWith("_data/p=1/")).sorted)

      // foreign-engine replay: copy every object through GET into a
      // mirror directory, read the mirror as plain parquet, compare rows
      val mirror = java.nio.file.Paths.get(tmpDir("s3proxy_mirror"))
      keys.foreach { k =>
        val r = get(s"$base/$k")
        assert(r.statusCode() === 200)
        val dest = mirror.resolve(k)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.write(dest, r.body())
        // byte-for-byte equal to the underlying immutable file
        val orig = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"${t.root}/$k"))
        assert(java.util.Arrays.equals(r.body(), orig), s"bytes differ for $k")
      }
      val replayed = spark.read.parquet(s"$mirror/_data")
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val direct = t.read()
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(replayed === direct && replayed.size === 90)

      // HEAD advertises the real object size (clients HEAD for length
      // before ranged footer reads)
      val k0 = keys.head
      val hd = client.send(HttpRequest.newBuilder(URI.create(s"$base/$k0"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(hd.statusCode() === 200 && hd.body().isEmpty)
      assert(hd.headers().firstValueAsLong("Content-Length").orElse(-1L) ===
        snapFiles.find(_.path == k0).get.fileBytes)
      // ranged HEAD sizes like the ranged GET it describes
      val hdr = client.send(HttpRequest.newBuilder(URI.create(s"$base/$k0"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody())
        .header("Range", "bytes=0-15").build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(hdr.statusCode() === 206)
      assert(hdr.headers().firstValueAsLong("Content-Length").orElse(-1L) === 16L)
      assert(hdr.headers().firstValue("Content-Range").orElse("")
        .startsWith("bytes 0-15/"))

      // max-keys=0 is a valid empty listing, never a 500
      val mk0 = get(s"$base?list-type=2&max-keys=0")
      assert(mk0.statusCode() === 200)
      val mk0Xml = new String(mk0.body(), "UTF-8")
      assert(keysOf(mk0Xml).isEmpty && mk0Xml.contains("<IsTruncated>false<"))

      // ranged GET (parquet readers fetch the footer first): the last 4
      // bytes of any parquet file are the PAR1 magic
      val tail = get(s"$base/$k0", "Range" -> "bytes=-4")
      assert(tail.statusCode() === 206)
      assert(new String(tail.body(), "US-ASCII") === "PAR1")
      val mid = get(s"$base/$k0", "Range" -> "bytes=1-8")
      assert(mid.statusCode() === 206 && mid.body().length === 8)
      val orig = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${t.root}/$k0"))
      assert(java.util.Arrays.equals(mid.body(),
        java.util.Arrays.copyOfRange(orig, 1, 9)))
      assert(Option(mid.headers().firstValue("Content-Range").orElse(null))
        .exists(_.startsWith("bytes 1-8/")))

      // safety: wrong bucket, traversal, and missing keys all 404 as XML
      assert(get(s"http://localhost:${addr.getPort}/nope?list-type=2")
        .statusCode() === 404)
      assert(get(s"$base/_log/whatever").statusCode() === 404)
      assert(get(s"$base/_data/../_log/x").statusCode() === 404)
      assert(get(s"$base/_data/p=1/ghost.parquet").statusCode() === 404)
    } finally proxy.stop()
  }

  test("416 unsatisfiable ranges, delimiter listing, ?ts= time travel, direct s3g:// read") {
    val t = new IceTable(spark, tmpDir("s3proxy2"),
      IceTableConfig(
        partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))),
        sortOrder = Seq("id")))
    t.insert((1 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    Thread.sleep(5)
    val tsAfterFirst = System.currentTimeMillis() // strict-< snapshot bound
    Thread.sleep(5)
    t.insert((61 to 90).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val proxy = new IceS3Proxy(t)
    val addr = proxy.start()
    val base = s"http://localhost:${addr.getPort}/${proxy.bucket}"
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      val k0 = t.snapshot().aliveFiles.head.path
      val len = t.snapshot().aliveFiles.head.fileBytes

      // ---- RFC 7233 / S3 416 semantics (a stale cached length must not
      // silently receive the whole object as if it were the window)
      val pastEof = get(s"$base/$k0", "Range" -> s"bytes=${len + 10}-")
      assert(pastEof.statusCode() === 416)
      assert(pastEof.headers().firstValue("Content-Range").orElse("") ===
        s"bytes */$len")
      assert(new String(pastEof.body(), "UTF-8").contains("InvalidRange"))
      val inverted = get(s"$base/$k0", "Range" -> "bytes=5-2")
      assert(inverted.statusCode() === 416)
      val zeroSuffix = get(s"$base/$k0", "Range" -> "bytes=-0")
      assert(zeroSuffix.statusCode() === 416)
      // malformed header: ignored per RFC — full object at 200
      val malformed = get(s"$base/$k0", "Range" -> "bytes=abc")
      assert(malformed.statusCode() === 200 && malformed.body().length === len)
      // HEAD answers the same unsatisfiable verdict, bodiless
      val headBad = client.send(HttpRequest.newBuilder(URI.create(s"$base/$k0"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody())
        .header("Range", s"bytes=${len * 2}-${len * 3}").build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(headBad.statusCode() === 416 && headBad.body().isEmpty)

      // ---- delimiter listing: partitions roll up into CommonPrefixes
      val dl = new String(
        get(s"$base?list-type=2&prefix=_data/&delimiter=/").body(), "UTF-8")
      val prefixes = "<CommonPrefixes><Prefix>([^<]+)</Prefix>".r
        .findAllMatchIn(dl).map(_.group(1)).toSeq
      assert(prefixes.sorted ===
        Seq("_data/p=0/", "_data/p=1/", "_data/p=2/"))
      assert(keysOf(dl).isEmpty, "delimiter roll-up must emit no direct keys")

      // ---- ?ts= snapshot time travel on LIST: the listing AS OF the
      // first commit is exactly that snapshot's manifest
      val early = keysOf(new String(
        get(s"$base?list-type=2&ts=$tsAfterFirst").body(), "UTF-8"))
      assert(early.sorted === t.snapshot(tsAfterFirst).aliveFiles.map(_.path).sorted)
      assert(early.nonEmpty &&
        early.size < t.snapshot().aliveFiles.size)

      // ---- the direct foreign read: Spark's parquet reader over the
      // s3g:// protocol client — delimiter LIST walk + HEAD + ranged GETs
      // against the LIVE endpoint, page size 2 so paging is exercised
      hc.set("fs.s3g.impl", classOf[GraftS3FileSystem].getName)
      hc.set("fs.s3g.impl.disable.cache", "true")
      hc.set("fs.s3g.endpoint", s"http://localhost:${addr.getPort}")
      hc.setInt("fs.s3g.list.max.keys", 2)
      val viaProxy = spark.read.parquet(s"s3g://${proxy.bucket}/_data")
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val direct = t.read()
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaProxy === direct && viaProxy.size === 90)

      // time-traveled direct read: the FS pins every LIST to the as-of
      // snapshot, so the whole query sees the first commit only
      hc.set("fs.s3g.snapshot.ts", tsAfterFirst.toString)
      val viaProxyEarly = spark.read.parquet(s"s3g://${proxy.bucket}/_data")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(viaProxyEarly === (1 to 60).map(_.toLong).toSet)
    } finally {
      hc.unset("fs.s3g.snapshot.ts")
      proxy.stop()
    }
  }

  test("directory keys are not objects: GET/HEAD of a partition level 404s") {
    // a real bucket has no directories; answering 200 for `_data/p=1`
    // made hierarchical clients treat the partition directory as a data
    // file and die mid-GET (the r11 a45 regression at sf0.01)
    val t = mk()
    val proxy = new IceS3Proxy(t)
    val addr = proxy.start()
    val base = s"http://localhost:${addr.getPort}/${proxy.bucket}"
    try {
      assert(get(s"$base/_data/p=1").statusCode() === 404)
      val head = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/_data/p=1"))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.discarding())
      assert(head.statusCode() === 404)
      // …while a real object under the same prefix still serves
      val k = t.snapshot().aliveFiles.map(_.path)
        .find(_.startsWith("_data/p=1/")).get
      assert(get(s"$base/$k").statusCode() === 200)
    } finally proxy.stop()
  }

  test("chaos mode: truncated GETs are absorbed by the client's retries") {
    // every 2nd data GET is torn down mid-body (3 injections, below the
    // 4-attempt budget): the read must survive with exact rows, and the
    // injections must really have happened
    val t = mk()
    val proxy = new IceS3Proxy(t, chaosEveryN = 2, chaosMax = 3)
    val addr = proxy.start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      hc.set("fs.s3g.impl", classOf[GraftS3FileSystem].getName)
      hc.set("fs.s3g.impl.disable.cache", "true")
      hc.set(s"fs.s3g.endpoint.${proxy.bucket}",
        s"http://localhost:${addr.getPort}")
      val n = spark.read.parquet(s"s3g://${proxy.bucket}/_data").count()
      assert(n === 90)
      assert(proxy.chaosHits > 0, "chaos must actually have injected failures")
    } finally proxy.stop()
  }
}
