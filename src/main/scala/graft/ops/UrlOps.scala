package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization and domain analytics — the companions of the WARC
  * ingest front end ([[graft.ingest.Warc]]): a crawl-derived corpus is
  * curated BY URL (domain mixing quotas, blocklists, per-domain dedup
  * keys) before any text-level pass. The reference has no web surface;
  * this is a scale extension.
  *
  * Everything here is a codegen'd column expression (regexp on RE2-safe
  * patterns — no lookarounds/backreferences, so the DuckDB oracle runs
  * the literal same regexes) — map-only, one scan, no UDFs.
  */
object UrlOps {

  /** Hostname (lowercased, port stripped) of an absolute URL; empty
    * string when the scheme/authority grammar doesn't match. */
  def hostOf(u: Column): Column =
    regexp_replace(
      lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
      ":[0-9]+$", "")

  /** Host with a leading `www.` label dropped — the common
    * serving-alias collapse. */
  def siteOf(u: Column): Column =
    regexp_replace(hostOf(u), "^www\\.", "")

  /** Last two host labels — the registrable-domain APPROXIMATION
    * (correct for .com/.org/...; merges distinct registrants under
    * two-level public suffixes like co.uk — a full fix needs the
    * Public Suffix List shipped as a lookup table, same slot). */
  def registeredDomainOf(u: Column): Column =
    regexp_extract(siteOf(u), "([^.]+\\.[^.]+)$", 1)

  /** Canonical dedup/quota key form: lowercase scheme and host, strip
    * the fragment and the query string, drop a trailing slash (the
    * root path collapses onto the bare authority — `a.com/` ≡ `a.com`,
    * which is what a dedup key wants). Non-absolute input normalizes
    * to "". Deliberately conservative — path CASE is preserved
    * (paths are case-sensitive per RFC 3986; only scheme+host are
    * case-insensitive). */
  def normalizeUrl(u: Column): Column = {
    val noFragOrQuery = regexp_replace(u, "[?#].*$", "")
    val schemeHostLower = concat(
      lower(regexp_extract(noFragOrQuery, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)),
      regexp_extract(noFragOrQuery, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1))
    regexp_replace(schemeHostLower, "(.)/$", "$1")
  }

  /** Per-domain corpus rollup: doc count, distinct normalized URLs,
    * total chars — the frame domain quotas/blocklists key on. One
    * map-only projection + one partial-agg groupBy. */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame =
    df.select(siteOf(col(urlCol)).as("domain"),
        normalizeUrl(col(urlCol)).as("norm_url"),
        length(col(textCol)).as("n_chars"))
      .filter(col("domain") =!= "")
      .groupBy("domain").agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("norm_url")).as("n_urls"),
        sum("n_chars").as("n_chars"))
}
