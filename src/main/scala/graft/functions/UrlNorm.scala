package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.internal.SQLConf

/** URL canonicalization — the web-corpus curation step upstream of
  * URL-keyed dedup and domain-level filtering (the C4/RefinedWeb
  * pipeline shape: one canonical URL per page, one registrable domain
  * per URL, tracking chrome stripped so syntactic variants of the same
  * page collide).
  *
  * The reference corpus has no URL column, so the probe battery
  * ([[graft.CoreQueries]] `url_normalize`) synthesizes URLs
  * deterministically from table data; these combinators are the
  * reusable surface. Each accessor reads one field of the native
  * [[UrlCanonParts]] struct — ONE `java.net.URI` parse per row (the
  * same parser `parse_url` wraps) instead of the six re-parses the
  * composed `parse_url` form paid, and zero interpreted
  * ArrayFilter/ArraySort lambdas for the tracking-param strip. The
  * composed forms are retained below as `*Hof` parity baselines
  * (UrlCanonSpec pins bit-equality on edge + fuzz corpora), and the
  * DuckDB oracle still parses with INDEPENDENT regexes so the two
  * engines genuinely cross-check the normalization rules.
  *
  * Rules (each one a documented, separately-testable step):
  *   1. scheme and host lowercase
  *   2. leading `www.` stripped from the host
  *   3. default ports dropped (`:80` for http, `:443` for https);
  *      any other explicit port kept
  *   4. fragment dropped
  *   5. tracking params dropped (`utm_*`, `ref`, `fbclid`, `gclid`),
  *      surviving params sorted byte-lexicographically (param order
  *      never distinguishes pages)
  *   6. empty path → `/`
  */
object UrlNorm {

  /** Params that identify the *visit*, not the page. */
  private val TrackingRe = "^(utm_[^=]*|ref|fbclid|gclid)="

  /** The whole canonical decomposition as one native struct — callers
    * selecting several accessors of the SAME url column pay one parse
    * per row (subexpression elimination collapses the instances). */
  def urlParts(u: Column): Column =
    org.apache.spark.sql.GraftBridge.column(UrlCanonParts(
      org.apache.spark.sql.GraftBridge.expression(u),
      SQLConf.get.ansiEnabled))

  /** Lowercased scheme, e.g. `https`. */
  def urlScheme(u: Column): Column = urlParts(u).getField("scheme")

  /** Lowercased host with any leading `www.` stripped (rule 2); the
    * port never appears here (it lives in AUTHORITY). */
  def urlHost(u: Column): Column = urlParts(u).getField("host")

  /** `:port` suffix for the canonical form — empty when the port is
    * absent or the scheme's default (rule 3). */
  def urlPortSuffix(u: Column): Column =
    urlParts(u).getField("port_suffix")

  /** Path with the empty-path → `/` normalization (rule 6). */
  def urlPath(u: Column): Column = urlParts(u).getField("path")

  /** Surviving query params (tracking stripped, rule 5) sorted and
    * re-joined; `''` when nothing survives. */
  def urlKeptQuery(u: Column): Column =
    urlParts(u).getField("kept_query")

  /** Registrable-domain heuristic: the last two host labels. A real
    * crawler consults the public-suffix list (`co.uk` etc.); the
    * two-label form is the standard PSL-free approximation and is
    * what the probe pins. */
  def urlDomain(u: Column): Column = urlParts(u).getField("domain")

  /** The full canonical URL (rules 1-6; fragment never re-attached). */
  def urlNormalize(u: Column): Column =
    urlParts(u).getField("canonical")

  // ---- composed parse_url/HOF forms — parity baselines ONLY ----

  private[graft] def urlSchemeHof(u: Column): Column =
    lower(parse_url(u, lit("PROTOCOL")))

  private[graft] def urlHostHof(u: Column): Column =
    regexp_replace(lower(parse_url(u, lit("HOST"))), "^www\\.", "")

  private def rawPortHof(u: Column): Column =
    regexp_extract(parse_url(u, lit("AUTHORITY")), ":(\\d+)$", 1)

  private[graft] def urlPortSuffixHof(u: Column): Column = {
    val p = rawPortHof(u)
    val s = urlSchemeHof(u)
    when(p === "" ||
         (s === "http" && p === "80") ||
         (s === "https" && p === "443"), lit(""))
      .otherwise(concat(lit(":"), p))
  }

  private[graft] def urlPathHof(u: Column): Column = {
    val p = parse_url(u, lit("PATH"))
    when(p.isNull || p === "", lit("/")).otherwise(p)
  }

  private[graft] def urlKeptQueryHof(u: Column): Column =
    array_join(
      array_sort(filter(
        split(coalesce(parse_url(u, lit("QUERY")), lit("")), "&"),
        p => !p.rlike(TrackingRe) && p =!= "")),
      "&")

  private[graft] def urlDomainHof(u: Column): Column =
    regexp_extract(urlHostHof(u), "([^.]+\\.[^.]+)$", 1)

  private[graft] def urlNormalizeHof(u: Column): Column = {
    val q = urlKeptQueryHof(u)
    concat(urlSchemeHof(u), lit("://"), urlHostHof(u),
      urlPortSuffixHof(u), urlPathHof(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
