package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation for crawl-derived corpora: normalization, registrable-
  * domain extraction, blocklist filtering, per-domain contribution stats
  * — the RefinedWeb/C4-style URL hygiene pass that runs before any text
  * processing.
  *
  * Everything is composed from codegen'd string/regexp/array built-ins
  * (map-only, inlines into the scan stage); the blocklist filter is a
  * literal `isin` for small lists or a broadcast anti-join for list
  * tables. All regexes are RE2-safe (no backtracking, no lookaround), so
  * the same algorithm replays in any engine — the oracle re-derives the
  * normalized form in DuckDB.
  */
object UrlOps {

  /** Multi-label public suffixes we recognize beyond plain TLDs. A real
    * deployment would load the full public-suffix list; the algorithm
    * (longest matching suffix + one label) is the standard one. */
  val MultiPartTlds: Seq[String] =
    Seq("co.uk", "com.au", "co.jp", "com.br", "co.in", "org.uk")

  /** Lowercased host of a URL: text between `://` (plus optional
    * userinfo) and the first `/`, `:`, `?`, or `#`. Empty when the value
    * does not parse as an absolute URL. */
  def host(url: Column): Column =
    regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)

  /** Registrable domain (eTLD+1 approximation): strip one leading
    * `www.`, then keep suffix+1 labels — 3 labels when the host ends in
    * a known multi-part suffix, else 2. Hosts with fewer labels pass
    * through unchanged. Kept to three anchored regexps (not a per-suffix
    * `endsWith` chain) so the expression tree stays small enough for
    * whole-stage codegen even after projection collapse inlines the
    * host extraction into every use. */
  def registrableDomain(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val multiAlt = MultiPartTlds.map(_.replace(".", "\\.")).mkString("|")
    val multi = regexp_extract(h, s"([^.]+\\.(?:$multiAlt))$$", 1)
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(length(multi) > 0, multi)
      .when(length(two) > 0, two)
      .otherwise(h)
  }

  /** Tracking query parameters removed by [[normalize]]. */
  private val TrackingParamRe = "^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref)="

  /** Canonical form of a URL, in four deterministic steps:
    *  1. drop the fragment (`#...`),
    *  2. lowercase (scheme and host are case-insensitive; crawl paths
    *     are lowercased as a corpus-level canonicalization choice),
    *  3. drop explicit default ports (`:80` for http, `:443` for https),
    *  4. drop tracking parameters (utm_*, gclid, fbclid, msclkid, ref),
    *     removing the `?` when nothing survives.
    * Every step is a pure string function replayable in any engine. */
  def normalize(url: Column): Column = {
    val noFrag = lower(regexp_replace(url, "#.*", ""))
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    val base = regexp_extract(noPort, "^([^?]*)", 1)
    val query = regexp_extract(noPort, "^[^?]*\\?(.*)", 1)
    val keptParams = filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamRe))
    when(length(query) === 0 || size(keptParams) === 0, base)
      .otherwise(concat(base, lit("?"), concat_ws("&", keptParams)))
  }

  /** Drop rows whose registrable domain is in a literal blocklist. */
  def filterBlocklist(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    df.where(!registrableDomain(col(urlCol)).isin(blocked: _*))

  /** Blocklist as a table (one `domain` column): broadcast anti-join —
    * the shape for real blocklists (10⁵-10⁶ domains fit in a broadcast;
    * beyond that drop the hint and let AQE pick the join). */
  def filterBlocklistDf(df: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame =
    df.join(broadcast(blocked.select(col("domain"))),
      registrableDomain(col(urlCol)) === col("domain"), "left_anti")

  /** Per-domain contribution profile: docs, token share — the input to
    * per-domain caps ([[Mixing.capPerKey]]) and mixing decisions. */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokenCount(col(textCol))
    val agged = df
      .groupBy(registrableDomain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("docs"), sum(toks).cast("long").as("tokens"))
    // scalar total via broadcast cross join — a global window here would
    // funnel every domain row through one partition
    val total = agged.agg(sum(col("tokens")).as("_total"))
    agged.crossJoin(broadcast(total))
      .withColumn("token_share", col("tokens").cast("double") / col("_total"))
      .drop("_total")
  }
}
