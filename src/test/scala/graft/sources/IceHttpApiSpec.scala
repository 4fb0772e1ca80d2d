package graft.sources

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._

/** A22 HTTP ingest/query API + A19 s3a config surface. */
class IceHttpApiSpec extends SparkSpec {

  test("POST /insert → /flush → GET /query round trip") {
    val table = new IceTable(spark, tmpDir("http"),
      IceTableConfig(
        partitionExpr = concat(lit("u="), col("user_id")),
        sortOrder = Seq("ts")))
    val api = new IceHttpApi(table, flushIntervalMs = 0) // manual flush
    val addr = api.start()
    val base = s"http://localhost:${addr.getPort}"
    val client = HttpClient.newHttpClient()
    try {
      val ndjson =
        """{"ts": 1, "event": "login", "user_id": "u1"}
          |{"ts": 2, "event": "logout", "user_id": "u1"}
          |{"ts": 3, "event": "login", "user_id": "u2"}""".stripMargin
      val ins = client.send(HttpRequest.newBuilder(URI.create(s"$base/insert"))
        .POST(HttpRequest.BodyPublishers.ofString(ndjson)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ins.statusCode() == 200 && ins.body().contains("\"buffered\": 3"))

      val fl = client.send(HttpRequest.newBuilder(URI.create(s"$base/flush"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(fl.body().contains("\"inserted_rows\": 3"), fl.body())

      val sql = java.net.URLEncoder.encode(
        "select user_id, count(*) as cnt from ice group by user_id order by user_id",
        "UTF-8")
      val q = client.send(HttpRequest.newBuilder(URI.create(s"$base/query?sql=$sql"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(q.statusCode() == 200)
      assert(q.body() == "user_id,cnt\nu1,2\nu2,1", q.body())

      // one atomic log append per flush (the batcher contract)
      assert(table.snapshot().logFiles.length == 1)
      // schema inferred like the reference: JSON ints → BIGINT
      assert(table.snapshot().schema("ts") == "BIGINT")
    } finally api.stop()
  }

  test("GET /manifest serves a live snapshot a foreign reader queries with no log fold") {
    import graft.ice.DeleteVectors
    import spark.implicits._
    val table = new IceTable(spark, tmpDir("http_manifest"),
      IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("id"), lit(4))),
        sortOrder = Seq("id")))
    table.insert((1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    DeleteVectors.deleteWhere(table, col("id") <= 4L) // dv marks must export
    val api = new IceHttpApi(table, flushIntervalMs = 0)
    val addr = api.start()
    val base = s"http://localhost:${addr.getPort}"
    val client = HttpClient.newHttpClient()
    try {
      val m = client.send(HttpRequest.newBuilder(URI.create(s"$base/manifest"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(m.statusCode() == 200)
      // byte-identical to a static export of the same snapshot
      assert(m.body().trim ==
        graft.ice.ManifestExport.manifestJson(table)._1)
      // a "foreign" reader: parse the served JSON, read the listed
      // parquet directly, anti-join the served delete files — never
      // touching the table's log
      val dest = s"${tmpDir("http_manifest_json")}/m.json"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dest), m.body())
      val (_, files, dels) = graft.ice.ManifestExport.readManifest(table, dest)
      val raw = spark.read.parquet(files: _*)
        .withColumn("_f", input_file_name())
        .withColumn("_r", col("_metadata.row_index"))
      val marks = spark.read.parquet(dels: _*)
      val foreign = raw.join(marks,
          raw("_f").endsWith(marks("path")) && raw("_r") === marks("row_index"),
          "left_anti")
        .select("id", "v")
      assert(foreign.orderBy("id").collect().toSeq ===
        table.read().orderBy("id").collect().toSeq)
      assert(foreign.count() === 36L)
      // the live DuckDB view SQL serves too, with the dv anti-join
      val sqlRes = client.send(HttpRequest.newBuilder(
          URI.create(s"$base/manifest.sql?view=snap"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(sqlRes.statusCode() == 200)
      assert(sqlRes.body().contains("CREATE OR REPLACE VIEW snap") &&
        sqlRes.body().contains("NOT EXISTS"), sqlRes.body())
      // time travel: ts= before the dv delete lists no delete files
      val dvLogTs = DeleteVectors.dvTable(table)
        .logio.currentLogFiles(DeleteVectors.dvTable(table).root)
        .map(f => graft.ice.IceLogIO.logFileInfo(f)._1).max
      val tt = client.send(HttpRequest.newBuilder(
          URI.create(s"$base/manifest?ts=$dvLogTs"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(tt.body().contains("\"delete_files\": []"), tt.body())
    } finally api.stop()
  }

  test("A19: s3a options map onto hadoop configuration") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    S3Config.applyS3a(conf, S3Config.S3Options(
      endpoint = Some("http://localhost:9000"),
      accessKey = Some("user"), secretKey = Some("password"),
      pathStyleAccess = true, retryLimit = 3))
    assert(conf.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(conf.get("fs.s3a.path.style.access") == "true")
    assert(conf.get("fs.s3a.retry.limit") == "3")
  }
}
