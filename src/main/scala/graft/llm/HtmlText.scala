package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step between WARC ingest
  * ([[graft.sources.Warc]]) and every text operator (language ID,
  * quality, dedup). A deliberately regex-algebra pipeline: every stage
  * is `regexp_replace`/`replace`, so the whole extraction runs inside
  * whole-stage codegen (no UDF, no interpreted lambda on the one path
  * 100% of a crawl flows through), and the pipeline is replayable
  * verbatim by a second engine — the DuckDB oracle runs the same
  * patterns under RE2, which is why every pattern here stays inside
  * the RE2-compatible subset (no backreferences, no lookaround; `.*?`
  * non-greedy and inline `(?is)` flags are common to both).
  *
  * Not a browser: like the C4/CCNet extractors this is the
  * pragmatic tier — drop non-content machine blocks (script / style /
  * comments), flatten tags, decode the entities that appear in
  * running text, normalize whitespace. Boilerplate REMOVAL (nav bars,
  * footers) is a corpus-level statistical operator
  * (TextAnalysis.gopherLineRules / line-dedup across docs), not a
  * per-page regex concern.
  */
object HtmlText {

  /** The per-stage patterns, exported so specs and oracles stay in
    * lockstep with the implementation (order matters: entity decode
    * must run AFTER tag stripping — `&lt;script&gt;` in running text
    * must surface as literal text, never execute as a tag; `&amp;`
    * must decode LAST or it would re-trigger the other entities). */
  val scriptPat = "(?is)<script[^>]*>.*?</script\\s*>"
  val stylePat = "(?is)<style[^>]*>.*?</style\\s*>"
  val commentPat = "(?s)<!--.*?-->"
  val tagPat = "<[^>]*>"
  /** ASCII whitespace, spelled explicitly: Java's `\s` and RE2's `\s`
    * disagree on vertical tab, so neither engine's shorthand is used. */
  val wsPat = "[ \\t\\r\\n\\f\\x0B]+"

  /** Extract readable text from an HTML column — the ONE-KERNEL
    * native form ([[graft.functions.HtmlExtractText]]: five tight
    * char passes, zero regex-engine invocations inside whole-stage
    * codegen). Bit-identical to [[htmlToTextHof]], the staged
    * regexp_replace pipeline this kernel replicates — WarcSpec pins
    * structured + fuzz parity, and the DuckDB oracles replay the
    * regex form under RE2, cross-checking both. */
  def htmlToText(html: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.HtmlExtractText(
        org.apache.spark.sql.GraftBridge.expression(html)))

  /** The staged regexp_replace reference pipeline (parity baseline
    * for the kernel; the SQL twin below replays exactly this). */
  def htmlToTextHof(html: Column): Column = {
    val noScript = regexp_replace(html, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noComment = regexp_replace(noStyle, commentPat, " ")
    val noTags = regexp_replace(noComment, tagPat, " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, ch)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), ch)
    }
    trim(regexp_replace(decoded, wsPat, " "))
  }

  /** Escape text for embedding into HTML (the fixture-synthesis
    * inverse of the entity decode above; `&` first, or the escapes
    * would double-escape). */
  def escapeHtml(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(text) { case (c, (ch, e)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ch), e) }

  /** Page-template segments shared by the Column and SQL forms (no
    * single quotes — they embed in SQL literals verbatim). The script
    * block deliberately contains a bare `<` (`n < 2`): naive tag
    * stripping without script removal would eat text from there to
    * the next `>`, so the fixture proves stage order, not just
    * stage presence. */
  private val pageHead =
    "<html><head><title></title><meta name=\"doc\" content=\""
  private val pageMid = "\"/>" +
    "<style type=\"text/css\">body { margin: 0; }</style>" +
    "<script type=\"text/javascript\">var n = 1; " +
    "if (n < 2) { n = n + 1; }</script>" +
    "</head><body><!-- boilerplate --><p>"
  private val pageTail = "</p></body></html>"

  /** Deterministic HTML page wrapper for round-trip fixtures: all
    * literal text content lives in the BODY (the id rides in a meta
    * attribute, the title stays empty), so extraction must recover
    * exactly the whitespace-collapsed body text — plus machine blocks
    * (script/style/comment) that extraction must drop. */
  def wrapPage(id: Column, escapedText: Column): Column =
    concat(lit(pageHead), id, lit(pageMid), escapedText, lit(pageTail))

  /** DuckDB twin of [[wrapPage]] — same segment constants. */
  def wrapPageSql(idExpr: String, escapedExpr: String): String =
    s"'$pageHead' || $idExpr || '$pageMid' || $escapedExpr || " +
      s"'$pageTail'"

  /** The DuckDB twin of [[htmlToText]] over a SQL expression — same
    * stages, same patterns, RE2 engine. Centralized here so a pattern
    * change cannot drift from its oracle. */
  def htmlToTextSql(expr: String): String = {
    val noScript = s"regexp_replace($expr, '$scriptPat', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '$stylePat', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '$commentPat', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '$tagPat', ' ', 'g')"
    // SQL-literal escaping: '' is one quote char; " needs none
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "''", "&nbsp;" -> " ",
        "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (ent, ch)) =>
        s"replace($e, '$ent', '$ch')" }
    s"trim(regexp_replace($decoded, '$wsPat', ' ', 'g'))"
  }

  /** DuckDB twin of [[escapeHtml]]. */
  def escapeHtmlSql(expr: String): String =
    s"replace(replace(replace($expr, '&', '&amp;'), '<', '&lt;'), " +
      "'>', '&gt;')"

  // double-quoted href in an anchor tag, any attribute order, case
  // blind — RE2 ∩ java.util.regex (char classes + lazy *, no
  // backrefs), same portability contract as the extraction patterns
  private val hrefPat = "(?i)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""

  /** Out-link extraction: every double-quoted anchor href, in document
    * order — the crawl-frontier / link-graph feed. Pure codegen
    * projection (`regexp_extract_all`), no shuffle. Single-quoted and
    * unquoted href forms are out of contract (the WARC synthesis
    * emits the quoted form; a lenient parser belongs in a browser,
    * not a deterministic pipeline). */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(hrefPat), lit(1))

  /** DuckDB twin of [[extractLinks]] — same pattern, RE2 engine. */
  def extractLinksSql(expr: String): String =
    s"regexp_extract_all($expr, '$hrefPat', 1)"
}
