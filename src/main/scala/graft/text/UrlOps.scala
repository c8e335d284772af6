package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-scraped corpora — the step before document
  * dedup in a crawl pipeline (C4/CCNet drop by URL before ever
  * hashing content): canonicalize URLs so trivially-distinct fetches
  * of the same page share one dedup key, and filter whole domains
  * against a blocklist with subdomain semantics.
  *
  * Everything is native Column expressions (parse_url + array HOFs —
  * no UDFs, stays inside codegen); the blocklist has two faces:
  * an in-expression literal for bounded lists and a broadcast
  * anti-join over exploded domain suffixes for blocklists too large
  * to inline (the 100 TB shape: a 100k-domain blocklist is a
  * broadcast table, the corpus side stays map-only).
  */
object UrlOps {

  private val TrackingParams = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref")

  /** Host (lowercased, no port, no credentials); NULL for unparseable. */
  def domain(u: Column): Column = lower(try_parse_url(u, lit("HOST")))

  /** Canonical dedup key for a URL:
    *  - scheme + host lowercased, ports dropped (transport detail,
    *    never part of page identity in a crawl)
    *  - fragment dropped (never reaches the server)
    *  - tracking params (utm_*, gclid, fbclid, …) removed
    *  - surviving query params SORTED (param order is transport noise)
    *  - empty path normalized to "/"
    * Unparseable URLs (no host) come back NULL so callers can route
    * them to quarantine instead of silently keeping junk keys. */
  def canonicalizeUrl(u: Column): Column = {
    val host = domain(u)
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val rawPath = try_parse_url(u, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", lit("/"))
      .otherwise(rawPath)
    val query = try_parse_url(u, lit("QUERY"))
    val keptParams = filter(
      split(coalesce(query, lit("")), "&"),
      p => length(p) > 0 &&
        !lower(element_at(split(p, "=", 2), 1)).isin(TrackingParams: _*) &&
        !lower(p).startsWith("utm_"))
    val sortedQuery = array_join(array_sort(keptParams), "&")
    val q = when(length(sortedQuery) > 0, concat(lit("?"), sortedQuery))
      .otherwise(lit(""))
    when(host.isNull || scheme.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, q))
  }

  /** Every DNS suffix of a dotted host, the match keys for subdomain
    * blocking: a.b.co -> [a.b.co, b.co, co]. */
  def domainSuffixes(host: Column): Column =
    transform(
      sequence(lit(1), size(split(host, "\\."))),
      i => array_join(slice(split(host, "\\."),
        i, size(split(host, "\\."))), "."))

  /** Small-blocklist face: one boolean expression, zero joins. A row is
    * blocked when its domain IS a blocked name or is a subdomain of
    * one ("evil.com" blocks "ads.evil.com", never "notevil.com"). */
  def isBlockedDomain(u: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "empty blocklist")
    val dom = domain(u)
    val arr = array(blocked.map(b => lit(b.toLowerCase)): _*)
    exists(arr, b => dom === b || dom.endsWith(concat(lit("."), b)))
  }

  /** Large-blocklist face: explode the ≤ label-count suffixes of each
    * row's domain and LEFT ANTI broadcast-join the blocklist — the
    * corpus side never shuffles. Unparseable URLs (NULL domain) are
    * KEPT (route them via canonicalizeUrl nullness, not silently
    * dropped here). */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocklist: DataFrame,
                           blockedCol: String): DataFrame = {
    val withDom = df.withColumn("__graft_dom", domain(col(urlCol)))
    val blocked = blocklist
      .select(lower(col(blockedCol)).as("__graft_suffix")).distinct()
    val hit = withDom
      .filter(col("__graft_dom").isNotNull)
      .select(col(urlCol), explode(domainSuffixes(col("__graft_dom")))
        .as("__graft_suffix"))
      .join(broadcast(blocked), "__graft_suffix")
      .select(col(urlCol)).distinct()
    df.join(hit, Seq(urlCol), "left_anti")
  }
}
