package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column, url: String): String =
    Seq(url).toDF("u").select(expr.as("r")).as[String].head()

  test("host extraction") {
    assert(one(UrlOps.host(col("u")), "https://Www.Ex.COM/a/b?q=1") == "www.ex.com")
    assert(one(UrlOps.host(col("u")), "http://user:pw@ex.com:8080/x") == "ex.com")
    assert(one(UrlOps.host(col("u")), "ftp://files.ex.org") == "files.ex.org")
    assert(one(UrlOps.host(col("u")), "not a url") == "")
  }

  test("registrable domain: www strip, eTLD+1, multi-part suffixes") {
    def d(u: String) = one(UrlOps.registrableDomain(col("u")), u)
    assert(d("https://www.news.example.com/a") == "example.com")
    assert(d("https://a.b.c.example.co.uk/x") == "example.co.uk")
    assert(d("http://example.co.uk") == "example.co.uk")
    assert(d("http://example.com") == "example.com")
    assert(d("http://localhost/x") == "localhost")
  }

  test("normalize: fragment, case, default ports, tracking params") {
    def n(u: String) = one(UrlOps.normalize(col("u")), u)
    assert(n("HTTP://Ex.COM/Path#Frag") == "http://ex.com/path")
    assert(n("http://ex.com:80/a") == "http://ex.com/a")
    assert(n("https://ex.com:443/a?x=1") == "https://ex.com/a?x=1")
    assert(n("https://ex.com:8443/a") == "https://ex.com:8443/a")
    assert(n("http://ex.com/a?utm_source=f&id=3&gclid=z") == "http://ex.com/a?id=3")
    assert(n("http://ex.com/a?utm_source=f") == "http://ex.com/a")
    assert(n("http://ex.com:80") == "http://ex.com")
    assert(n("http://ex.com/a?ref=tw&refresh=1") == "http://ex.com/a?refresh=1")
  }

  test("blocklist filters by registrable domain, literal and table form") {
    val df = Seq(
      (1L, "http://www.spam.example.com/x"),
      (2L, "http://good.org/y"),
      (3L, "http://sub.spam.example.com/z")).toDF("id", "url")
    val kept = UrlOps.filterBlocklist(df, "url", Seq("example.com"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L))
    val blockedTable = Seq("example.com").toDF("domain")
    val kept2 = UrlOps.filterBlocklistDf(df, "url", blockedTable)
      .select("id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(2L))
  }

  test("domainStats aggregates docs/tokens/share per registrable domain") {
    val df = Seq(
      ("http://a.ex.com/1", "one two three"),
      ("http://b.ex.com/2", "four five"),
      ("http://other.org/3", "six")).toDF("url", "text")
    val got = UrlOps.domainStats(df, "url", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("ex.com") == ((2L, 5L, 5.0 / 6.0)))
    assert(got("other.org") == ((1L, 1L, 1.0 / 6.0)))
  }
}
