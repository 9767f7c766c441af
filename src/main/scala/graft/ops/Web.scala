package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL structure operations for web-corpus pipelines: scheme/host/path
  * decomposition (Spark's codegen'd `parse_url`) plus registrable-domain
  * extraction — the key for domain blocklists, per-domain quotas, and
  * provenance stats at crawl scale. Everything is a pure column
  * expression: no UDFs, no shuffle until the caller aggregates by the
  * extracted key. */
object Web {

  /** Second-level public suffixes treated as part of the TLD when
    * extracting the registrable domain. A deliberately small, explicit
    * subset of the Public Suffix List — callers with real crawl data pass
    * their own (the full PSL is data, not code). */
  val DefaultTwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp", "com.au",
    "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in", "co.kr",
    "com.sg", "com.tr")

  def urlScheme(url: Column): Column = call_function("try_parse_url", url, lit("PROTOCOL"))
  def urlHost(url: Column): Column = call_function("try_parse_url", url, lit("HOST"))
  def urlPath(url: Column): Column = call_function("try_parse_url", url, lit("PATH"))
  def urlQuery(url: Column): Column = call_function("try_parse_url", url, lit("QUERY"))

  /** The registrable ("pay-level") domain of a host: the last two labels,
    * or three when the last two form a listed second-level public suffix
    * (site.co.uk → site.co.uk, www.site.com → site.com). Hosts with fewer
    * labels pass through unchanged. */
  def registrableDomain(host: Column,
      twoLevelSuffixes: Seq[String] = DefaultTwoLevelSuffixes): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val lastTwo = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    when(n <= 2, host)
      .when(lastTwo.isin(twoLevelSuffixes: _*),
        concat_ws(".", element_at(parts, -3), lastTwo))
      .otherwise(lastTwo)
  }

  /** Per-domain crawl cap — "at most N pages per registrable domain", the
    * anti-SEO-farm quota every web pipeline applies. Membership within a
    * domain is the N smallest unsigned hash64(key) rows (deterministic,
    * retry/partitioning-stable, subset-stable as N grows). Adds `outCol`
    * with the registrable domain; runs as a WindowGroupLimit rank filter —
    * each task keeps ≤N rows per domain BEFORE the shuffle. */
  def capPerDomain(df: DataFrame, url: Column, key: Column,
      maxPerDomain: Int, outCol: String = "domain",
      twoLevelSuffixes: Seq[String] = DefaultTwoLevelSuffixes): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain must be >= 1")
    require(!df.columns.contains(outCol),
      s"input already contains column $outCol")
    Sampling.stratifiedBottomK(
      df.withColumn(outCol, registrableDomain(urlHost(url), twoLevelSuffixes)),
      col(outCol), key, maxPerDomain)
  }

  /** All `href` targets of anchor tags in an HTML document, in document
    * order — the crawl-frontier / link-graph extraction step. Pure
    * scan-side codegen'd expression (one RE2∩Java-compatible regex pass,
    * no UDF); double- and single-quoted attribute values, any attribute
    * order, case-insensitive. Null HTML → null. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a\\b[^>]*?href\\s*=\\s*[\"']([^\"'>]+)[\"']"), lit(1))

  /** Domain-level link edges (src_domain, dst_domain) from crawled pages:
    * every absolute http(s) link of every page becomes one edge from the
    * page's registrable domain to the target's — the input
    * [[Graph.pageRank]] ranks. Relative, mailto:, javascript: and other
    * non-http targets are dropped, as are unparseable hosts. Pure
    * scan-side work (extract → explode → parse); the caller's
    * aggregation/pageRank owns the first shuffle. One page with k links
    * emits k rows, so an edge appears once per occurrence — aggregate
    * with count to weight parallel edges. */
  def linkGraph(df: DataFrame, pageUrl: Column, html: Column,
      twoLevelSuffixes: Seq[String] = DefaultTwoLevelSuffixes): DataFrame =
    df.select(
        registrableDomain(urlHost(pageUrl), twoLevelSuffixes).as("src_domain"),
        explode(extractLinks(html)).as("__l"))
      .where(col("__l").rlike("(?i)^https?://"))
      .select(col("src_domain"),
        registrableDomain(urlHost(col("__l")), twoLevelSuffixes).as("dst_domain"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull)

  /** One-struct decomposition: (scheme, host, domain, path, query). */
  def parseUrl(url: Column,
      twoLevelSuffixes: Seq[String] = DefaultTwoLevelSuffixes): Column = {
    val host = urlHost(url)
    struct(
      urlScheme(url).as("scheme"),
      host.as("host"),
      registrableDomain(host, twoLevelSuffixes).as("domain"),
      urlPath(url).as("path"),
      urlQuery(url).as("query"))
  }
}
