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
