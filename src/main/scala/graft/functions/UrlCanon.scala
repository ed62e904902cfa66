package graft.functions

import java.net.{URI, URISyntaxException}
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object UrlCanonUtil {

  /** Params that identify the *visit*, not the page — same pattern
    * (and the same java.util.regex `find()` semantics) as the
    * [[UrlNorm]] combinator form. */
  private val Tracking = Pattern.compile("^(utm_[^=]*|ref|fbclid|gclid)=")
  private val PortRe = Pattern.compile(":(\\d+)$")
  private val DomainRe = Pattern.compile("([^.]+\\.[^.]+)$")
  private val Amp = Pattern.compile("&")

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** All of [[UrlNorm]]'s rules 1-6 from ONE `java.net.URI` parse (the
    * same parser `parse_url` wraps), replicating the composed Column
    * form's null/edge semantics EXACTLY — including the non-obvious
    * ones the parity spec pins:
    *  - null / unparseable url (failOnError=false): scheme, host,
    *    port_suffix, domain, canonical are null BUT path = "/" (the
    *    isNull branch of urlPath) and kept_query = "" (the coalesce
    *    upstream of the split);
    *  - unparseable url with failOnError (ANSI mode): the same
    *    INVALID_URL error `parse_url` raises;
    *  - port present but scheme null: the when() null-semantics keep
    *    the `:port` suffix (null && false = false → otherwise branch);
    *  - authority present but no port: regexp_extract's no-match ""
    *    → suffix "" (not null);
    *  - host with no dot: domain "" (regexp_extract no-match), not
    *    null;
    *  - query "a=1&&b": the empty fragment is dropped by the filter,
    *    survivors sort in UTF8String BYTE order (array_sort on
    *    StringType), join skips nothing (none null).
    */
  def canon(u: UTF8String, failOnError: Boolean): InternalRow = {
    val uri: URI =
      if (u == null) null
      else try new URI(u.toString) catch {
        case e: URISyntaxException =>
          if (failOnError)
            throw org.apache.spark.sql.GraftBridge.invalidUrlError(u, e)
          else null
      }
    val scheme0 = if (uri == null) null else uri.getScheme
    val host0 = if (uri == null) null else uri.getHost
    val path0 = if (uri == null) null else uri.getRawPath
    val query0 = if (uri == null) null else uri.getRawQuery
    val auth0 = if (uri == null) null else uri.getRawAuthority

    // rule 1: lower via UTF8String.toLowerCase — bit-identical to
    // Spark's lower()
    val scheme =
      if (scheme0 == null) null else utf8(scheme0).toLowerCase
    val schemeStr = if (scheme == null) null else scheme.toString
    // rule 2: regexp_replace(^www\.) replaces at most once, at the
    // start of the LOWERED host
    val host: String =
      if (host0 == null) null
      else {
        val h = utf8(host0).toLowerCase.toString
        if (h.startsWith("www.")) h.substring(4) else h
      }
    // rule 3: regexp_extract(AUTHORITY, ":(\d+)$", 1) — "" on
    // no-match, null on null authority
    val rawPort: String =
      if (auth0 == null) null
      else {
        val m = PortRe.matcher(auth0)
        if (m.find()) m.group(1) else ""
      }
    val portSuffix: String =
      if (rawPort == null) null // concat(":", null) of the otherwise
      else if (rawPort == "" ||
        (schemeStr == "http" && rawPort == "80") ||
        (schemeStr == "https" && rawPort == "443")) ""
      else ":" + rawPort
    // rule 6: empty path → "/" (also the null-url path — urlPath's
    // isNull branch)
    val path: String =
      if (path0 == null || path0.isEmpty) "/" else path0
    // rule 5: split on & (empty query splits to [""]), drop empties
    // and tracking params, sort in UTF8String byte order, re-join
    val parts = Amp.split(if (query0 == null) "" else query0, -1)
    var nKept = 0
    val keptArr = new Array[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && !Tracking.matcher(p).find()) {
        keptArr(nKept) = utf8(p)
        nKept += 1
      }
      i += 1
    }
    java.util.Arrays.sort(keptArr, 0, nKept,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < nKept) {
      if (i > 0) sb.append('&')
      sb.append(keptArr(i).toString)
      i += 1
    }
    val keptQuery = sb.toString
    // registrable-domain heuristic over the canonical host
    val domain: String =
      if (host == null) null
      else {
        val m = DomainRe.matcher(host)
        if (m.find()) m.group(1) else ""
      }
    // concat() is null if ANY input is null; path and keptQuery are
    // never null here
    val canonical: String =
      if (schemeStr == null || host == null || portSuffix == null) null
      else schemeStr + "://" + host + portSuffix + path +
        (if (keptQuery.isEmpty) "" else "?" + keptQuery)

    new GenericInternalRow(Array[Any](
      scheme,
      if (host == null) null else utf8(host),
      if (portSuffix == null) null else utf8(portSuffix),
      utf8(path),
      utf8(keptQuery),
      if (domain == null) null else utf8(domain),
      if (canonical == null) null else utf8(canonical)))
  }
}

/** struct<scheme, host, port_suffix, path, kept_query, domain,
  * canonical> — URL canonicalization (UrlNorm rules 1-6) as ONE native
  * expression: one URI parse per row instead of the composed form's
  * six `parse_url` re-parses, and zero interpreted HOF lambdas for the
  * tracking-param filter/sort (ArrayFilter/ArraySort are
  * CodegenFallback). The output struct is never null (a null or
  * unparseable input still yields path "/" and kept_query "" — the
  * composed form's coalesce/isNull semantics); subexpression
  * elimination evaluates one instance per row however many fields a
  * projection picks. Parity vs the retained combinator baselines is
  * pinned in UrlCanonSpec (edge + fuzz corpora, and the ANSI
  * INVALID_URL throw). */
case class UrlCanonParts(child: Expression, failOnError: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("scheme", StringType, nullable = true),
    StructField("host", StringType, nullable = true),
    StructField("port_suffix", StringType, nullable = true),
    StructField("path", StringType, nullable = false),
    StructField("kept_query", StringType, nullable = false),
    StructField("domain", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true)))
  override def prettyName: String = "url_canon_parts"

  // NOT nullSafeEval: a null url still produces a non-null struct
  // (path "/", kept_query "")
  override def eval(input: InternalRow): Any =
    UrlCanonUtil.canon(
      child.eval(input).asInstanceOf[UTF8String], failOnError)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.functions.UrlCanonUtil.canon(
        ${c.isNull} ? null : ${c.value}, $failOnError);
    """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UrlCanonParts = copy(child = newChild)
}
