package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document text-battery kernels — the VERDICT r9 #1 item.
  *
  * The four every-document operators (gopherRules, c4Signals,
  * gopherLineRules, repetitionSignals) previously ran their per-word
  * loops as `filter`/`transform`/`aggregate`/`array_intersect`
  * higher-order functions — CodegenFallback, ~µs per interpreted
  * lambda element (the measured PqEncodeCodes pathology, 11.2→0.9 s).
  * Each battery is now ONE native expression computing every counter
  * in a single primitive pass over the document, returning a struct
  * the caller projects — so 100 % of a 100 TB corpus flows through a
  * tight Java loop inside whole-stage codegen instead of an
  * interpreted lambda per token.
  *
  * CONTRACT: results are bit-identical to the HOF forms (the oracles
  * did not move). That means faithfully replicating the Catalyst /
  * Java-regex semantics the HOF forms leaned on:
  *  - Spark `length()` counts CODE POINTS (`UTF8String.numChars`),
  *    not UTF-16 units — astral-plane chars count once;
  *  - Spark `trim()` strips ONLY 0x20 spaces (SPARK-17299), so a CRLF
  *    line keeps its '\r';
  *  - Java regex `\s` (no UNICODE_CHARACTER_CLASS) is exactly
  *    `[ \t\n\x0B\f\r]`;
  *  - Java regex `$` (no MULTILINE) matches at end of input AND just
  *    before one FINAL line terminator (`\n \r     `,
  *    with `\r\n` as one unit) — so `"foo.\r"` DOES match `[.!?]$`;
  *  - Spark `lower()` is `UTF8String.toLowerCase` (ASCII fast path,
  *    else String#toLowerCase) — replicated by round-tripping
  *    non-ASCII tokens through UTF8String.
  * TextKernelsSpec pins each trap and the end-to-end parity vs the
  * retained `*Hof` forms in [[graft.llm.TextAnalysis]].
  */
object TextKernelUtil {

  /** Java regex `\s` without UNICODE_CHARACTER_CLASS. */
  @inline private def isJavaSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  @inline private def isLineTerminator(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
      c == '\u2029'

  /** Positions where Java `$` can match in `s` (end; before one final
    * terminator; before a final `\r\n` pair). */
  private def dollarPositions(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) Array(0)
    else {
      val last = s.charAt(n - 1)
      if (last == '\n' && n >= 2 && s.charAt(n - 2) == '\r')
        Array(n, n - 2)
      else if (isLineTerminator(last)) Array(n, n - 1)
      else Array(n)
    }
  }

  /** `rlike "[.!?\"]$"` on a line. */
  private def endsTerminal(s: String): Boolean =
    dollarPositions(s).exists { p =>
      p > 0 && { val c = s.charAt(p - 1)
        c == '.' || c == '!' || c == '?' || c == '"' }
    }

  /** Suffix `(\.\.\.|…)` ending exactly at `p`. */
  @inline private def ellipsisAt(s: String, p: Int): Boolean =
    (p >= 3 && s.charAt(p - 1) == '.' && s.charAt(p - 2) == '.' &&
      s.charAt(p - 3) == '.') || (p >= 1 && s.charAt(p - 1) == '…')

  /** `rlike "(\\.\\.\\.|…)$"` (no \s* — the c4Signals form). */
  private def endsEllipsis(s: String): Boolean =
    dollarPositions(s).exists(ellipsisAt(s, _))

  /** `rlike "(\\.\\.\\.|…)\\s*$"` (the gopherLineRules form). */
  private def endsEllipsisWs(s: String): Boolean =
    dollarPositions(s).exists { p =>
      var i = p
      while (i > 0 && isJavaSpace(s.charAt(i - 1))) i -= 1
      ellipsisAt(s, i)
    }

  /** `rlike "^[-*•]"`. */
  @inline private def startsBullet(s: String): Boolean =
    s.nonEmpty && { val c = s.charAt(0)
      c == '-' || c == '*' || c == '•' }

  /** `rlike "^\\s*[-*•]"`. */
  private def startsBulletWs(s: String): Boolean = {
    var i = 0
    while (i < s.length && isJavaSpace(s.charAt(i))) i += 1
    i < s.length && { val c = s.charAt(i)
      c == '-' || c == '*' || c == '•' }
  }

  /** Spark `trim()`: strip 0x20 only (SPARK-17299). */
  private def sparkTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Spark `length()` = code points. */
  @inline private def cpLen(s: String, from: Int, to: Int): Long =
    s.codePointCount(from, to).toLong

  /** Spark `lower()` on one token: ASCII fast path, else the exact
    * UTF8String.toLowerCase round trip. */
  private def sparkLowerTok(s: String, from: Int, to: Int): String = {
    var ascii = true
    var i = from
    while (ascii && i < to) { if (s.charAt(i) >= 0x80) ascii = false
      i += 1 }
    if (ascii) {
      val out = new Array[Char](to - from)
      var j = 0
      i = from
      while (i < to) {
        val c = s.charAt(i)
        out(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        i += 1; j += 1
      }
      new String(out)
    } else UTF8String.fromString(s.substring(from, to))
      .toLowerCase.toString
  }

  /** gopherRules word battery over RAW text: tokens = maximal runs of
    * non-`\s` chars (≡ `filter(split(txt, "\\s+"), _ != "")`).
    * Returns (n_words, n_chars, n_alpha, n_stop) — n_stop = number of
    * DISTINCT `stops` entries hit by any lowercased token. `stops`
    * must be lowercase; at most 64 entries (bitmask). */
  def gopherWordStats(txt: UTF8String, stops: Array[String]): InternalRow = {
    val s = txt.toString
    val n = s.length
    var nWords = 0L
    var nChars = 0L
    var nAlpha = 0L
    var stopMask = 0L
    var i = 0
    while (i < n) {
      while (i < n && isJavaSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var alpha = false
        while (i < n && !isJavaSpace(s.charAt(i))) {
          val c = s.charAt(i)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
            alpha = true
          i += 1
        }
        nWords += 1
        nChars += cpLen(s, start, i)
        if (alpha) nAlpha += 1
        val low = sparkLowerTok(s, start, i)
        var k = 0
        while (k < stops.length) {
          if ((stopMask & (1L << k)) == 0 && stops(k) == low)
            stopMask |= 1L << k
          k += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](nWords, nChars, nAlpha,
      java.lang.Long.bitCount(stopMask).toLong))
  }

  /** c4Signals battery over RAW text: token stats on the LOWERCASED
    * doc (≡ split(normalizeText(raw), " ")), line stats on the raw
    * lines (split "\n" → trim → nonempty). Returns (n_words, sum_len,
    * n_alpha, n_lines, n_term, n_bullet, n_ell). */
  def c4Stats(txt: UTF8String): InternalRow = {
    val low = txt.toLowerCase.toString
    var nWords = 0
    var sumLen = 0L
    var nAlpha = 0L
    var i = 0
    val n = low.length
    while (i < n) {
      while (i < n && isJavaSpace(low.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var alpha = false
        while (i < n && !isJavaSpace(low.charAt(i))) {
          val c = low.charAt(i)
          if (c >= 'a' && c <= 'z') alpha = true
          i += 1
        }
        nWords += 1
        sumLen += cpLen(low, start, i)
        if (alpha) nAlpha += 1
      }
    }
    val raw = txt.toString
    var nLines = 0L
    var nTerm = 0L
    var nBullet = 0L
    var nEll = 0L
    var from = 0
    val rn = raw.length
    while (from <= rn) {
      var to = raw.indexOf('\n', from)
      if (to < 0) to = rn
      val line = sparkTrim(raw.substring(from, to))
      if (line.nonEmpty) {
        nLines += 1
        if (endsTerminal(line)) nTerm += 1
        if (startsBullet(line)) nBullet += 1
        if (endsEllipsis(line)) nEll += 1
      }
      from = to + 1
    }
    new GenericInternalRow(Array[Any](nWords, sumLen, nAlpha, nLines,
      nTerm, nBullet, nEll))
  }

  /** gopherLineRules battery: per-doc duplicate-line statistics over
    * the NONEMPTY raw lines (split "\n", keep != "", NO trim), line
    * length in code points. Returns (n_lines, n_dup, n_chars,
    * n_dup_chars, n_bullet, n_ell). */
  def gopherLineStats(txt: UTF8String): InternalRow = {
    val raw = txt.toString
    val counts = new mutable.HashMap[String, Long]()
    var from = 0
    val rn = raw.length
    while (from <= rn) {
      var to = raw.indexOf('\n', from)
      if (to < 0) to = rn
      if (to > from) {
        val line = raw.substring(from, to)
        counts.update(line, counts.getOrElse(line, 0L) + 1L)
      }
      from = to + 1
    }
    var nLines = 0L
    var nDup = 0L
    var nChars = 0L
    var nDupChars = 0L
    var nBullet = 0L
    var nEll = 0L
    counts.foreach { case (line, c) =>
      val len = cpLen(line, 0, line.length)
      nLines += c
      nChars += c * len
      if (c > 1) { nDup += c; nDupChars += c * len }
      if (startsBulletWs(line)) nBullet += c
      if (endsEllipsisWs(line)) nEll += c
    }
    new GenericInternalRow(Array[Any](nLines, nDup, nChars, nDupChars,
      nBullet, nEll))
  }

  /** Maximal runs of non-`\s` chars of the Spark-lowercased text —
    * the token stream `split(normalizeText(c), " ")` yields (minus
    * the [""]-for-empty artifact, which callers handle). */
  private def lowerTokens(txt: UTF8String): Array[String] = {
    val s = txt.toLowerCase.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      while (i < n && isJavaSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isJavaSpace(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.toArray
  }

  /** normTokens: the non-empty token stream of normalized text —
    * `filter(split(normalizeText(c), " "), length(_) > 0)` (the
    * model-score / heavy-hitter tokenization) as one pass. */
  def normTokens(txt: UTF8String): ArrayData =
    new GenericArrayData(
      lowerTokens(txt).map(t => UTF8String.fromString(t): Any))

  /** sentenceSplit: `filter(transform(split(c, "[.!?]+"), trim),
    * length(_) > 0)` — maximal runs of non-terminal chars, 0x20-trimmed,
    * empties dropped (the leading/trailing-empty split artifacts all
    * die in the filter, so runs are sufficient). */
  def sentenceSplit(txt: UTF8String): ArrayData = {
    val s = txt.toString
    val n = s.length
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      while (i < n && { val c = s.charAt(i)
        c == '.' || c == '!' || c == '?' }) i += 1
      if (i < n) {
        val start = i
        while (i < n && { val c = s.charAt(i)
          c != '.' && c != '!' && c != '?' }) i += 1
        val t = sparkTrim(s.substring(start, i))
        if (t.nonEmpty) out += UTF8String.fromString(t)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** One sentence through normalizeText: non-`\s` runs of the
    * Spark-lowercased string joined by single spaces (`trim ∘
    * collapse-\s+ ∘ lower` — lower can't mint whitespace, so the run
    * form is exact). A whitespace-only sentence normalizes to "". */
  private def normalizeOne(s: String): String = {
    val low = sparkLowerTok(s, 0, s.length)
    val n = low.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var first = true
    while (i < n) {
      while (i < n && isJavaSpace(low.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isJavaSpace(low.charAt(i))) i += 1
        if (!first) sb.append(' ')
        sb.append(low, start, i)
        first = false
      }
    }
    sb.toString
  }

  /** normSentences: `transform(sentenceSplit(c), normalizeText)` — the
    * per-sentence normalize of sentence-grain dedup, fused. Elements
    * may be "" (a sentence of pure non-0x20 whitespace normalizes to
    * empty AFTER the non-empty filter ran on the raw sentence) — the
    * HOF form keeps those and so does this. */
  def normSentences(txt: UTF8String): ArrayData = {
    val raw = sentenceSplit(txt)
    val n = raw.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(
        normalizeOne(raw.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Spark `md5()`: lowercase hex of MD5 over the UTF-8 bytes. */
  private def md5Hex(s: UTF8String): String = {
    val d = md5Digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** minShingleMd5: `array_min(transform(wordShingles(c, n), md5))` —
    * the 1-value winnowing fingerprint. Hex digests are ASCII, so
    * String compare ≡ UTF8String binary compare; wordShingles never
    * returns an empty array (empty doc → [""]), so the min exists. */
  def minShingleMd5(txt: UTF8String, n: Int): UTF8String = {
    val sh = wordShingles(txt, n)
    var best: String = null
    var i = 0
    while (i < sh.numElements()) {
      val h = md5Hex(sh.getUTF8String(i))
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    UTF8String.fromString(best)
  }

  /** sortedLineJoin: see [[SortedLineJoin]]. Sort order replicates
    * array_sort's struct comparator exactly: null elements last; then
    * idx asc with null idx FIRST; then line asc (UTF8String byte
    * order) with null line FIRST. Null lines are skipped by the join
    * (array_join semantics), with no separator emitted for them. */
  def sortedLineJoin(arr: ArrayData, sep: String): UTF8String = {
    val n = arr.numElements()
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) {
      rows(i) = if (arr.isNullAt(i)) null else arr.getStruct(i, 2)
      i += 1
    }
    java.util.Arrays.sort(rows, (a: InternalRow, b: InternalRow) => {
      if (a == null && b == null) 0
      else if (a == null) 1        // null struct elements sort LAST
      else if (b == null) -1
      else {
        val aNullIdx = a.isNullAt(0); val bNullIdx = b.isNullAt(0)
        val c1 =
          if (aNullIdx && bNullIdx) 0
          else if (aNullIdx) -1    // null field sorts FIRST (asc)
          else if (bNullIdx) 1
          else java.lang.Integer.compare(a.getInt(0), b.getInt(0))
        if (c1 != 0) c1
        else {
          val aNullL = a.isNullAt(1); val bNullL = b.isNullAt(1)
          if (aNullL && bNullL) 0
          else if (aNullL) -1
          else if (bNullL) 1
          else a.getUTF8String(1).compareTo(b.getUTF8String(1))
        }
      }
    })
    val sb = new java.lang.StringBuilder
    var first = true
    i = 0
    while (i < n) {
      val r = rows(i)
      // a null struct's .getField("line") is null → array_join skips it
      if (r != null && !r.isNullAt(1)) {
        if (!first) sb.append(sep)
        sb.append(r.getUTF8String(1).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** chunkTokens: overlapping `window`-token chunks at `stride` over a
    * pre-split token array — `transform(sequence(0, nchunks−1), i =>
    * struct(array_join(slice(toks, i·stride+1, window), " "),
    * size(slice)))` fused (nchunks = 1 for ≤ window tokens, else
    * ⌈(n−window)/stride⌉+1). Join skips null tokens (array_join), the
    * count keeps them (size) — both per the HOF composition. */
  def chunkTokens(arr: ArrayData, window: Int,
                  stride: Int): ArrayData = {
    val n = arr.numElements()
    val k =
      if (n <= window) 1
      else math.ceil((n - window).toDouble / stride).toInt + 1
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val from = c * stride
      val to = math.min(from + window, n)
      val sb = new java.lang.StringBuilder
      var first = true
      var i = from
      while (i < to) {
        if (!arr.isNullAt(i)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(i).toString)
          first = false
        }
        i += 1
      }
      out(c) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(sb.toString),
        math.max(to - from, 0)))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** wordShingles: n-token shingles over normalized text; < n tokens
    * → the whole normalized text as one shingle (`[""]` for an
    * empty/whitespace doc — the split-of-empty artifact the HOF form
    * produces). */
  def wordShingles(txt: UTF8String, n: Int): ArrayData = {
    val toks = lowerTokens(txt)
    if (toks.length < n)
      new GenericArrayData(Array[Any](
        UTF8String.fromString(toks.mkString(" "))))
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** wordBigramsStaged over a pre-split token array: adjacent pairs
    * joined by " " (concat_ws semantics — null elements are skipped,
    * not propagated); < 2 tokens → empty array. */
  def arrayBigrams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        val a = arr.getUTF8String(i)
        val b = arr.getUTF8String(i + 1)
        val s =
          if (a == null && b == null) ""
          else if (a == null) b.toString
          else if (b == null) a.toString
          else a.toString + " " + b.toString
        out(i) = UTF8String.fromString(s)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Occurrence count of `stops` members in a token array (the
    * `size(filter(toks, isInCollection))` loop; null tokens drop like
    * the filter's null predicate). `stops` pre-lowercased ASCII. */
  def tokenStopHits(arr: ArrayData, stops: Array[String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val s = t.toString
        var k = 0
        var hit = false
        while (!hit && k < stops.length) {
          if (stops(k) == s) hit = true
          k += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }

  /** langIdStaged's argmax: per-language stopword occurrence counts
    * over the token array, max score wins, ties to the EARLIEST
    * language in list order, no hits → "und". (The caller keeps the
    * CJK short-circuit as a codegen'd regexp.) */
  def langPick(arr: ArrayData, langs: Array[String],
               stops: Array[Array[String]]): UTF8String = {
    var bestS = 0
    var bestLang: String = null
    var li = 0
    while (li < langs.length) {
      val ws = stops(li)
      val n = arr.numElements()
      var s = 0
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        if (t != null) {
          val str = t.toString
          var k = 0
          var hit = false
          while (!hit && k < ws.length) {
            if (ws(k) == str) hit = true
            k += 1
          }
          if (hit) s += 1
        }
        i += 1
      }
      if (s > bestS) { bestS = s; bestLang = langs(li) }
      li += 1
    }
    UTF8String.fromString(if (bestS > 0) bestLang else "und")
  }

  /** linearScoreRaw's fold: Σ tokenWeight(tok) in exact LONG space,
    * tokenWeight = (24-bit md5 prefix mod 2001) − 1000 — the same
    * md5-hex → base-16 parse the conv(substring(md5)) composition
    * computes. A null token nulls the whole sum (the aggregate
    * lambda's null propagation). */
  /** hashedShingleTable / decontShingles / dupNgramRate, fused: the
    * distinct n-token shingles of the normalized text (first-
    * occurrence order — array_distinct semantics) hashed with Spark's
    * own XXH64 (`XXH64.hashUTF8String(s, 42)` == `xxhash64(s)` bit
    * for bit, probed). `outerDistinct` re-distincts the HASHES (the
    * decontamination composition's second array_distinct — only a
    * hash collision could make it matter, but the parity contract is
    * the composition, not the intent). */
  def hashedShingles(txt: UTF8String, n: Int,
                     outerDistinct: Boolean): ArrayData = {
    val toks = lowerTokens(txt)
    val shingles = new java.util.LinkedHashSet[String]()
    if (toks.length < n) shingles.add(toks.mkString(" "))
    else {
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        shingles.add(sb.toString)
        i += 1
      }
    }
    val hashes = new java.util.ArrayList[Any](shingles.size)
    val seen = if (outerDistinct)
      new java.util.HashSet[java.lang.Long]() else null
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(it.next()), 42L)
      if (seen == null || seen.add(java.lang.Long.valueOf(h)))
        hashes.add(java.lang.Long.valueOf(h))
    }
    new GenericArrayData(hashes.toArray)
  }

  /** Sliding k-token windows over a pre-split token array: window i
    * covers tokens [i·stride, i·stride + window); windows join with
    * " " skipping null tokens (concat_ws/array_join semantics); fewer
    * than `window` tokens → empty array. `distinct` keeps first
    * occurrences (the passage-dedup composition). */
  def tokenWindows(arr: ArrayData, window: Int, stride: Int,
                   distinct: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < window) new GenericArrayData(Array.empty[Any])
    else {
      val nw = (n - window) / stride + 1
      val out = new java.util.ArrayList[Any](nw)
      val seen = if (distinct) new java.util.HashSet[String]() else null
      var i = 0
      while (i < nw) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        var first = true
        while (j < window) {
          val t = arr.getUTF8String(i * stride + j)
          if (t != null) {
            if (!first) sb.append(' ')
            sb.append(t.toString)
            first = false
          }
          j += 1
        }
        val w = sb.toString
        if (seen == null || seen.add(w))
          out.add(UTF8String.fromString(w))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def linearScore(arr: ArrayData): java.lang.Long = {
    val md = md5Local.get()
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) return null
      md.reset()
      val d = md.digest(t.getBytes)
      // first 6 hex chars = first 3 digest bytes, big-endian
      val v = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) |
        (d(2) & 0xffL)
      acc += v % 2001L - 1000L
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** repetitionSignals battery over NORMALIZED text: tokens =
    * `split(norm, " ")` INCLUDING the [""]-for-empty edge; bigram
    * counts in one per-doc hash map (the former explode + two-level
    * groupBy shuffle, now a pure projection). Returns (n_tok,
    * n_distinct, total_bg, distinct_bg, top_bg). */
  def repetitionStats(norm: UTF8String): InternalRow = {
    val arr = norm.toString.split(" ", -1)
    val nTok = arr.length
    val distinct = new mutable.HashSet[String]()
    var i = 0
    while (i < nTok) { distinct += arr(i); i += 1 }
    var totalBg = 0L
    var topBg = 0L
    val bg = new mutable.HashMap[String, Long]()
    i = 0
    while (i < nTok - 1) {
      val key = arr(i) + " " + arr(i + 1)
      val c = bg.getOrElse(key, 0L) + 1L
      bg.update(key, c)
      if (c > topBg) topBg = c
      totalBg += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, distinct.size, totalBg,
      bg.size.toLong, topBg))
  }

  // ---------- HTML extraction (HtmlText.htmlToText kernel) ----------

  /** Case-insensitive find, ASCII folding ONLY — Java regex `(?i)`
    * without UNICODE_CASE never folds non-ASCII (U+0130 İ must NOT
    * match the `i` of `script`, though Character.toLowerCase maps
    * it there). `needle` is ASCII lowercase. */
  private def indexOfIgnoreCase(s: String, needle: String,
                                from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && {
        val a = s.charAt(i + j)
        val af = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        af == needle.charAt(j)
      }) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  /** Global replace of `(?is)<name[^>]*>.*?</name\s*>` with one
    * space, replicating Java-regex scan semantics exactly: candidate
    * starts are occurrences of case-insensitive `<name`; the open tag
    * completes at the FIRST `>` (greedy `[^>]*` backtracks to it);
    * the close is the EARLIEST `</name` followed by `\s*>` (the
    * non-greedy `.*?`); an incompletable candidate stays literal and
    * scanning resumes one char later, exactly like Matcher.find. */
  private def stripBlock(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name
    val n = s.length
    var i = 0
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      val o = indexOfIgnoreCase(s, open, i)
      if (o < 0) {
        if (sb == null) return s
        sb.append(s, i, n); i = n
      } else {
        var matched = false
        val tagEnd = s.indexOf('>', o + open.length)
        if (tagEnd >= 0) {
          var c = indexOfIgnoreCase(s, close, tagEnd + 1)
          while (!matched && c >= 0) {
            var j = c + close.length
            while (j < n && isJavaSpace(s.charAt(j))) j += 1
            if (j < n && s.charAt(j) == '>') {
              if (sb == null) sb = new java.lang.StringBuilder(n)
              sb.append(s, i, o).append(' ')
              i = j + 1
              matched = true
            } else c = indexOfIgnoreCase(s, close, c + 1)
          }
        }
        if (!matched) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, i, o + 1)
          i = o + 1
        }
      }
    }
    if (sb == null) s else sb.toString
  }

  /** Global replace of `(?s)<!--.*?-->` with one space. Once a
    * `<!--` has no `-->` ahead, no later candidate can match either. */
  private def stripComments(s: String): String = {
    val n = s.length
    var i = 0
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      val o = s.indexOf("<!--", i)
      if (o < 0) {
        if (sb == null) return s
        sb.append(s, i, n); i = n
      } else {
        val c = s.indexOf("-->", o + 4)
        if (c < 0) {
          if (sb == null) return s
          sb.append(s, i, n); i = n
        } else {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, i, o).append(' ')
          i = c + 3
        }
      }
    }
    if (sb == null) s else sb.toString
  }

  /** Global replace of `<[^>]*>` with one space: first `<` to first
    * `>`; a `<` with no `>` ahead ends all matching. */
  private def stripTags(s: String): String = {
    val n = s.length
    var i = 0
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      val o = s.indexOf('<', i)
      if (o < 0) {
        if (sb == null) return s
        sb.append(s, i, n); i = n
      } else {
        val c = s.indexOf('>', o + 1)
        if (c < 0) {
          if (sb == null) return s
          sb.append(s, i, n); i = n
        } else {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, i, o).append(' ')
          i = c + 1
        }
      }
    }
    if (sb == null) s else sb.toString
  }

  /** Entity decode (lt/gt/quot/#39/nbsp/amp) + whitespace collapse +
    * trim in ONE emit pass. Equivalence with the sequential
    * regexp_replace chain holds because no entity's decoded output
    * contains `&` except `&amp;`'s — which the chain decodes LAST, so
    * neither form ever re-decodes produced text (HtmlText scaladoc;
    * WarcSpec fuzz pins it). Collapse folds every `[ \t\r\n\f\x0B]`
    * run (nbsp decodes to a plain space first, joining runs exactly
    * as in the staged form) and drops leading/trailing runs — Spark's
    * space-only `trim` suffices there because every edge run has
    * already collapsed to a single 0x20. */
  private def decodeCollapse(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    @inline def entityAt(e: String): Boolean =
      s.regionMatches(i, e, 0, e.length)
    while (i < n) {
      var ch = s.charAt(i)
      var adv = 1
      if (ch == '&') {
        if (entityAt("&lt;")) { ch = '<'; adv = 4 }
        else if (entityAt("&gt;")) { ch = '>'; adv = 4 }
        else if (entityAt("&quot;")) { ch = '"'; adv = 6 }
        else if (entityAt("&#39;")) { ch = '\''; adv = 5 }
        else if (entityAt("&nbsp;")) { ch = ' '; adv = 6 }
        else if (entityAt("&amp;")) { ch = '&'; adv = 5 }
      }
      if (isJavaSpace(ch)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(ch)
      }
      i += adv
    }
    sb.toString
  }

  /** One-kernel HTML → text extraction, bit-identical to the staged
    * regexp_replace pipeline in [[graft.llm.HtmlText]] (whose regex
    * form remains the parity baseline and the oracle's DuckDB twin):
    * script/style blocks, comments, tags, entities, whitespace — five
    * tight char passes, zero regex-engine invocations on the path
    * every crawled page flows through. */
  def htmlExtract(html: UTF8String): UTF8String = {
    val s = stripTags(stripComments(
      stripBlock(stripBlock(html.toString, "script"), "style")))
    UTF8String.fromString(decodeCollapse(s))
  }
}

/** Base for the one-string-in, stats-struct-out battery expressions:
  * null-propagating, codegen'd via a static-kernel call (the
  * [[PqEncodeCodes]] pattern). */
abstract class TextBatteryExpression extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  /** Fully-qualified static call taking the input variable name. */
  protected def kernelCall(ctx: CodegenContext, v: String): String

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ${kernelCall(ctx, v)};")
}

/** Struct(n_words L, n_chars L, n_alpha L, n_stop L) — gopherRules. */
case class GopherWordStats(child: Expression, stops: Seq[String])
    extends TextBatteryExpression {
  require(stops.size <= 64, "stop list is bitmask-bounded at 64")
  private val stopArr = stops.toArray
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "gopher_word_stats"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.gopherWordStats(v.asInstanceOf[UTF8String], stopArr)
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String = {
    val ref = ctx.addReferenceObj("gopherStops", stopArr,
      "java.lang.String[]")
    s"graft.functions.TextKernelUtil.gopherWordStats($v, $ref)"
  }
  override protected def withNewChildInternal(
      newChild: Expression): GopherWordStats = copy(child = newChild)
}

/** Struct(n_words I, sum_len L, n_alpha L, n_lines L, n_term L,
  * n_bullet L, n_ell L) — c4Signals. */
case class C4Stats(child: Expression) extends TextBatteryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_term", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ell", LongType, nullable = false)))
  override def prettyName: String = "c4_stats"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.c4Stats(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.c4Stats($v)"
  override protected def withNewChildInternal(
      newChild: Expression): C4Stats = copy(child = newChild)
}

/** Struct(n_lines L, n_dup L, n_chars L, n_dup_chars L, n_bullet L,
  * n_ell L) — gopherLineRules. */
case class GopherLineStats(child: Expression)
    extends TextBatteryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_dup_chars", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ell", LongType, nullable = false)))
  override def prettyName: String = "gopher_line_stats"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.gopherLineStats(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.gopherLineStats($v)"
  override protected def withNewChildInternal(
      newChild: Expression): GopherLineStats = copy(child = newChild)
}

/** array<string> of n-token shingles over normalized text —
  * TextAnalysis.wordShingles' native form (the zip_with-of-slices
  * chain is n−1 CodegenFallback HOF nodes per row). */
case class WordShinglesExpr(child: Expression, n: Int)
    extends TextBatteryExpression {
  require(n >= 1 && n <= 16, s"shingle size must be in [1, 16], got $n")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.wordShingles(v.asInstanceOf[UTF8String], n)
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.wordShingles($v, $n)"
  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesExpr = copy(child = newChild)
}

/** array<long> of XXH64-hashed distinct n-token shingles — the fused
  * `[array_distinct∘]transform(array_distinct(wordShingles(c)),
  * xxhash64)` composition every dedup/decontamination pipeline runs
  * per document. */
case class HashedShingles(child: Expression, n: Int,
                          outerDistinct: Boolean)
    extends TextBatteryExpression {
  require(n >= 1 && n <= 16, s"shingle size must be in [1, 16], got $n")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.hashedShingles(v.asInstanceOf[UTF8String], n,
      outerDistinct)
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.hashedShingles($v, $n, " +
      s"$outerDistinct)"
  override protected def withNewChildInternal(
      newChild: Expression): HashedShingles = copy(child = newChild)
}

/** array<string> of sliding k-token windows over a pre-split token
  * array — the `transform(sequence, i => join(slice(toks, …)))`
  * composition of the substring/passage dedup operators. */
case class TokenWindows(child: Expression, window: Int, stride: Int,
                        distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1 && stride >= 1,
    s"window/stride must be >= 1, got $window/$stride")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_windows"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.tokenWindows(v.asInstanceOf[ArrayData], window,
      stride, distinct)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernelUtil.tokenWindows(" +
        s"$v, $window, $stride, $distinct);")
  override protected def withNewChildInternal(
      newChild: Expression): TokenWindows = copy(child = newChild)
}

/** Adjacent-pair bigrams over a pre-split array<string> —
  * wordBigramsStaged's native form. */
case class ArrayBigrams(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "array_bigrams"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.arrayBigrams(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernelUtil.arrayBigrams($v);")
  override protected def withNewChildInternal(
      newChild: Expression): ArrayBigrams = copy(child = newChild)
}

/** Stopword occurrence count over a token array —
  * TextAnalysis.stopwordCount's per-token loop, native. */
case class TokenStopHits(child: Expression, stops: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  private val stopArr = stops.toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_stop_hits"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.tokenStopHits(v.asInstanceOf[ArrayData], stopArr)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopHits", stopArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernelUtil" +
        s".tokenStopHits($v, $ref);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): TokenStopHits = copy(child = newChild)
}

/** Language pick over a token array (argmax of per-language stopword
  * hits, ties to the earliest language, no hits → "und") —
  * langIdStaged's native form. */
case class LangPickTokens(child: Expression,
                          langTable: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes {
  private val langArr = langTable.map(_._1).toArray
  private val stopArr = langTable.map(_._2.toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_pick"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.langPick(v.asInstanceOf[ArrayData], langArr, stopArr)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val lref = ctx.addReferenceObj("langNames", langArr,
      "java.lang.String[]")
    val sref = ctx.addReferenceObj("langStops", stopArr,
      "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernelUtil" +
        s".langPick($v, $lref, $sref);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): LangPickTokens = copy(child = newChild)
}

/** Hashed-linear-model activation over a token array —
  * linearScoreRaw's fold, native (the HOF form runs an interpreted
  * md5+conv+mod lambda per token). Null on a null token, like the
  * aggregate lambda's null propagation. */
case class LinearScore(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "linear_score"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.linearScore(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Long ls = graft.functions.TextKernelUtil.linearScore($v);
      if (ls == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ls.longValue(); }""")
  override protected def withNewChildInternal(
      newChild: Expression): LinearScore = copy(child = newChild)
}

/** array<string> of non-empty normalized tokens —
  * `filter(split(normalizeText(c), " "), length(_) > 0)`, native. */
case class NormTokensExpr(child: Expression)
    extends TextBatteryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "norm_tokens"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.normTokens(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.normTokens($v)"
  override protected def withNewChildInternal(
      newChild: Expression): NormTokensExpr = copy(child = newChild)
}

/** array<string> of trimmed non-empty sentences —
  * TextAnalysis.sentences' split/trim/filter chain, native. */
case class SentencesExpr(child: Expression)
    extends TextBatteryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sentence_split"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.sentenceSplit(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.sentenceSplit($v)"
  override protected def withNewChildInternal(
      newChild: Expression): SentencesExpr = copy(child = newChild)
}

/** array<string> of per-sentence-normalized sentences — the fused
  * `transform(sentences(c), normalizeText)` of sentence-grain dedup.
  * Elements may be "" (whitespace-only sentence), never null. */
case class NormSentencesExpr(child: Expression)
    extends TextBatteryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "norm_sentences"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.normSentences(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.normSentences($v)"
  override protected def withNewChildInternal(
      newChild: Expression): NormSentencesExpr = copy(child = newChild)
}

/** Reassemble a line-deduped document: sort the collected
  * (idx, line) structs by struct order and join the line field —
  * `array_join(transform(array_sort(arr), _.getField("line")), sep)`
  * fused into one native pass. The composed form is an interpreted
  * lambda per KEPT LINE of the corpus (every document flows through
  * the line-dedup rewrite), the PqEncode pathology at line grain.
  * Replicated semantics: array_sort's default struct ordering (field
  * by field — idx asc, then line with NULL FIRST; null struct
  * elements LAST), array_join's null-element skip. */
case class SortedLineJoin(child: Expression, sep: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StructType(Seq(
    StructField("idx", IntegerType), StructField("line", StringType)))))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StringType
  override def prettyName: String = "sorted_line_join"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.sortedLineJoin(v.asInstanceOf[ArrayData], sep)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernelUtil.sortedLineJoin(" +
        s"$v, $sepRef);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): SortedLineJoin = copy(child = newChild)
}

/** array<struct<chunk_text string, n_tokens int>> of overlapping
  * token chunks — Corpus.chunkDocuments' per-document transform,
  * native. */
case class ChunkTokens(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1 && stride >= 1,
    s"window/stride must be >= 1, got $window/$stride")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "chunk_tokens"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.chunkTokens(v.asInstanceOf[ArrayData], window, stride)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernelUtil.chunkTokens(" +
        s"$v, $window, $stride);")
  override protected def withNewChildInternal(
      newChild: Expression): ChunkTokens = copy(child = newChild)
}

/** Min shingle md5 (1-value winnowing fingerprint) —
  * `array_min(transform(wordShingles(c, n), md5))`, native. */
case class MinShingleMd5(child: Expression, n: Int)
    extends TextBatteryExpression {
  require(n >= 1 && n <= 16, s"shingle size must be in [1, 16], got $n")
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.minShingleMd5(v.asInstanceOf[UTF8String], n)
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.minShingleMd5($v, $n)"
  override protected def withNewChildInternal(
      newChild: Expression): MinShingleMd5 = copy(child = newChild)
}

/** Struct(n_tok I, n_distinct I, total_bg L, distinct_bg L, top_bg L)
  * — repetitionSignals. */
case class RepetitionStats(child: Expression)
    extends TextBatteryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("total_bg", LongType, nullable = false),
    StructField("distinct_bg", LongType, nullable = false),
    StructField("top_bg", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.repetitionStats(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.repetitionStats($v)"
  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)
}

/** String → extracted text, the one-kernel form of
  * [[graft.llm.HtmlText.htmlToText]] (TextKernelUtil.htmlExtract). */
case class HtmlExtractText(child: Expression)
    extends TextBatteryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract_text"
  override def nullSafeEval(v: Any): Any =
    TextKernelUtil.htmlExtract(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext,
                                    v: String): String =
    s"graft.functions.TextKernelUtil.htmlExtract($v)"
  override protected def withNewChildInternal(
      newChild: Expression): HtmlExtractText = copy(child = newChild)
}
