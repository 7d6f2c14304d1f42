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
    * two-level public suffixes like co.uk — [[registrableDomainOf]]
    * is the PSL-backed fix and the default for domain quotas). */
  def registeredDomainOf(u: Column): Column =
    regexp_extract(siteOf(u), "([^.]+\\.[^.]+)$", 1)

  /** Checked-in Public Suffix List snapshot (publicsuffix.org format,
    * curated subset — the full PSL file drops into the same resource
    * unchanged), split by rule depth. Wildcard/exception rules are
    * rejected at load: the few ccTLDs needing them fall back to the
    * two-label approximation. Sorted for deterministic plan literals. */
  lazy val (pslSuffixes2: Seq[String], pslSuffixes3: Seq[String]) = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.txt")
    require(in != null, "psl_snapshot.txt missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rules = try src.getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
    finally src.close()
    require(rules.forall(r => !r.contains("*") && !r.startsWith("!")),
      "wildcard/exception PSL rules are not supported by this loader")
    val byDepth = rules.groupBy(_.count(_ == '.'))
    require(byDepth.keySet.subsetOf(Set(1, 2)),
      s"unsupported PSL rule depth: ${byDepth.keySet}")
    (byDepth.getOrElse(1, Vector.empty).distinct.sorted,
      byDepth.getOrElse(2, Vector.empty).distinct.sorted)
  }

  /** PSL-backed registrable domain: longest public-suffix match from
    * the snapshot plus one label — shop.example.co.uk → example.co.uk,
    * u.github.io → u.github.io, svc.k12.ca.us → svc.k12.ca.us — with
    * the last-two-labels approximation as the fallback for suffixes
    * the snapshot doesn't list. A host that IS a public suffix (bare
    * "co.uk") has no registrable domain per the PSL; this returns the
    * host itself (a grouping key beats an empty string for quota
    * rollups). Engine shape: two `isin` literal sets compile to
    * codegen'd InSet probes — still map-only, one scan, no UDF, and
    * the oracle replays the same lists as SQL IN. At full-PSL scale
    * (~9k rules) the sets stay InSet hash probes (Spark converts isin
    * above 10 items); a broadcast-join table is the alternative slot
    * if plan-literal size ever bites. */
  def registrableDomainOf(u: Column): Column = {
    val site = siteOf(u)
    val last2 = regexp_extract(site, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(site, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val last4 = regexp_extract(site, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last3.isin(pslSuffixes3: _*) && last4 =!= "", last4)
      .when(last2.isin(pslSuffixes2: _*) && last3 =!= "", last3)
      .otherwise(last2)
  }

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

  /** Tracking / click-id query parameters — noise a crawl's canonical
    * URL key must not carry (the same article arrives once per
    * newsletter campaign otherwise). Anchored name match; the value is
    * irrelevant. */
  val TrackingParamRe: String =
    "^(utm_[^=]*|fbclid|gclid|dclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$"

  /** Canonical crawl-dedup URL key — [[normalizeUrl]] plus the parts
    * a real crawl needs: fragment dropped, scheme+host lowercased with
    * DEFAULT ports stripped (:80 http / :443 https — same resource,
    * different bytes), tracking parameters ([[TrackingParamRe]])
    * removed, and the SURVIVING query parameters SORTED by name so
    * `?a=1&b=2` and `?b=2&a=1` collapse to one key; an emptied query
    * drops its `?`. Path case and non-tracking values are preserved
    * (RFC 3986: only scheme+host are case-insensitive). Pure column
    * expressions — map-only at any scale, and every step replays in
    * SQL (the oracle does). */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe)))
    val schemeHost =
      lower(regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    val noDefaultPort = regexp_replace(
      regexp_replace(schemeHost, "^(http://[^:/]*):80$", "$1"),
      "^(https://[^:/]*):443$", "$1")
    val path = regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    val joined = regexp_replace(concat(noDefaultPort, path), "(.)/$", "$1")
    when(size(kept) > 0, concat(joined, lit("?"), array_join(kept, "&")))
      .otherwise(joined)
  }

  /** Per-domain document quota — the crawl-curation cap ("at most N
    * docs per registrable domain" keeps one SEO farm from dominating a
    * training mix): rank within [[registrableDomainOf]] by the
    * portable id-hash priority and keep the first `maxPerDomain`.
    * Deterministic (no rand() — a re-crawl keeps the same survivors),
    * engine-replayable, and scale-shaped by delegation to
    * [[TextAnalytics.stratifiedQuota]]'s two-stage shard-pruned exact
    * rank — no whole-domain single-reducer sort even for a
    * million-doc domain. Returns kept rows + `registrable_domain` +
    * `sample_rank`. */
  def domainQuotaSample(df: DataFrame, urlCol: String, idCol: String,
      maxPerDomain: Int, shards: Int = 64): DataFrame =
    TextAnalytics.stratifiedQuota(
      df.withColumn("registrable_domain", registrableDomainOf(col(urlCol))),
      idCol, "registrable_domain", maxPerDomain, shards)

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
