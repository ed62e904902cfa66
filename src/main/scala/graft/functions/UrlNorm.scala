package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus curation step upstream of
  * URL-keyed dedup and domain-level filtering (the C4/RefinedWeb
  * pipeline shape: one canonical URL per page, one registrable domain
  * per URL, tracking chrome stripped so syntactic variants of the same
  * page collide).
  *
  * The reference corpus has no URL column, so the probe battery
  * ([[graft.CoreQueries]] `url_normalize`) synthesizes URLs
  * deterministically from table data; these combinators are the
  * reusable surface. All pure `Column` combinators over built-in
  * expressions (`parse_url`, regex, array ops) — no UDFs, fully
  * distributed, and the DuckDB oracle parses with INDEPENDENT regexes
  * so the two engines genuinely cross-check the normalization rules.
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

  /** Lowercased scheme, e.g. `https`. */
  def urlScheme(u: Column): Column =
    lower(parse_url(u, lit("PROTOCOL")))

  /** Lowercased host with any leading `www.` stripped (rule 2); the
    * port never appears here (it lives in AUTHORITY). */
  def urlHost(u: Column): Column =
    regexp_replace(lower(parse_url(u, lit("HOST"))), "^www\\.", "")

  /** Explicit port as a string, `''` when absent. */
  private def rawPort(u: Column): Column =
    regexp_extract(parse_url(u, lit("AUTHORITY")), ":(\\d+)$", 1)

  /** `:port` suffix for the canonical form — empty when the port is
    * absent or the scheme's default (rule 3). */
  def urlPortSuffix(u: Column): Column = {
    val p = rawPort(u)
    val s = urlScheme(u)
    when(p === "" ||
         (s === "http" && p === "80") ||
         (s === "https" && p === "443"), lit(""))
      .otherwise(concat(lit(":"), p))
  }

  /** Path with the empty-path → `/` normalization (rule 6). */
  def urlPath(u: Column): Column = {
    val p = parse_url(u, lit("PATH"))
    when(p.isNull || p === "", lit("/")).otherwise(p)
  }

  /** Surviving query params (tracking stripped, rule 5) sorted and
    * re-joined; `''` when nothing survives. */
  def urlKeptQuery(u: Column): Column =
    array_join(
      array_sort(filter(
        split(coalesce(parse_url(u, lit("QUERY")), lit("")), "&"),
        p => !p.rlike(TrackingRe) && p =!= "")),
      "&")

  /** Registrable-domain heuristic: the last two host labels. A real
    * crawler consults the public-suffix list (`co.uk` etc.); the
    * two-label form is the standard PSL-free approximation and is
    * what the probe pins. */
  def urlDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)

  /** The full canonical URL (rules 1-6; fragment never re-attached). */
  def urlNormalize(u: Column): Column = {
    val q = urlKeptQuery(u)
    concat(urlScheme(u), lit("://"), urlHost(u), urlPortSuffix(u),
      urlPath(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
