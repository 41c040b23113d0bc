package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level operators for crawl curation: canonicalization, URL-exact
  * dedup (the cheapest dedup a crawl pipeline runs — before any content
  * hashing), and per-domain corpus statistics (the crawl-health /
  * domain-mix dashboard numbers).
  *
  * All scan-stage column arithmetic plus one key-partitioned groupBy
  * each — no driver state, no all-pairs anything, so they hold at crawl
  * scale unchanged.
  */
object WebOps {

  /** Lowercased host part: `parse_url` (Spark's codegen'd URI parser —
    * strips port and userinfo) with a regex fallback for the hosts
    * java.net.URI rejects (underscores are common in dirty crawls; the
    * fallback also strips userinfo/port so both paths agree on shape).
    * Without the fallback every URI-invalid host would silently merge
    * into one null bucket of the domain stats.
    *
    * The gate oracle mirrors only the simple scheme://host/path URLs the
    * derived column produces (no port/userinfo/invalid hosts there); the
    * edge shapes are pinned by TextSignalsSpec instead.
    */
  def hostOf(url: Column): Column = lower(coalesce(
    parse_url(url, lit("HOST")),
    regexp_extract(url, "^[^/]*//(?:[^/?#@]*@)?([^/?#:]*)", 1)))

  /** Canonical form for URL-exact dedup: strip the fragment, strip one
    * trailing slash, lowercase the scheme+host (the case-insensitive
    * parts — the path stays case-sensitive per RFC 3986).
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noSlash = regexp_replace(noFrag, "/$", "")
    // lowercase scheme://host, keep the rest verbatim
    val head = regexp_extract(noSlash, "^[^/]*//[^/?#]*", 0)
    concat(lower(head), substring(noSlash, length(head) + 1, lit(1 << 30)))
  }

  /** URL-exact dedup groups: one row per normalized URL seen more than
    * zero times — (url_norm, keep_id = min doc_id, n_docs). One groupBy
    * on the normalized string; at crawl scale the head (url shorteners,
    * session-id mills) is bounded by map-side partial aggregation.
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.groupBy(normalizeUrl(col(urlCol)).as("url_norm"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))

  /** Per-domain corpus statistics: doc count, total token count, distinct
    * canonical URLs. Integer sums only — deterministic under any
    * partitioning (no floating-point accumulation order to pin).
    */
  def domainStats(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.select(hostOf(col(urlCol)).as("host"),
        normalizeUrl(col(urlCol)).as("url_norm"),
        size(TextAnalysis.tokensCol(col("text"))).cast("long").as("nt"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        countDistinct("url_norm").as("n_urls"))
}
