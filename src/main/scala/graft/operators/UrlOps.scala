package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web-corpus pipelines (SURVEY.md §2.5 layer C):
 * the normalize-before-group step behind URL-level dedup, per-domain
 * quotas, and crawl-frontier bookkeeping. One canonical form per page
 * means one hash key per page — without it the same document re-enters
 * the corpus once per tracking-param variant.
 *
 * All pure regexp/array built-ins — narrow codegen per-row maps with no
 * shuffle, replayable in DuckDB (same regexes, list_filter for the param
 * scrub). The parse is intentionally regexp-structural (scheme ://
 * authority path ?query #fragment) rather than java.net.URI: the exact
 * char-level contract must be engine-independent so the oracle can assert
 * it bit-for-bit.
 */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme, '' if the value has none. */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host: authority minus userinfo and port, 'www.' stripped. */
  def host(url: Column): Column = {
    val auth = lower(regexp_extract(url, SchemeRe + "([^/?#]*)", 2))
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val noPort = regexp_replace(noUser, ":[0-9]*$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path component, case preserved ('' when absent). */
  def path(url: Column): Column =
    regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 2)

  /** Query string with tracking params (utm_*, fbclid, gclid) and empty
    * params removed, remaining params in original order. */
  def cleanQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    array_join(
      filter(split(q, "&"), p =>
        p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)")),
      "&")
  }

  /**
   * Canonical URL: lowercased scheme+host, userinfo/port/www./fragment
   * dropped, tracking params scrubbed, empty path normalized to '/'.
   * Values with no scheme come back as-is (pass-through for junk rows —
   * filter on `scheme() =!= ""` upstream if junk must be dropped).
   */
  def normalizeUrl(url: Column): Column = {
    val p = when(path(url) === "", "/").otherwise(path(url))
    val q = cleanQuery(url)
    val norm = concat(scheme(url), lit("://"), host(url), p,
      when(q === "", "").otherwise(concat(lit("?"), q)))
    when(scheme(url) === "", url).otherwise(norm)
  }

  /** Registered domain: the last two dot-labels of the normalized host
    * ('' when the host has fewer than two labels). A real crawler
    * consults the public-suffix list; the two-label rule is the
    * deterministic, oracle-replayable core of it. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)
}
