package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / WARC/1.x) source — the Common Crawl ingest shape
  * that sits in front of every web-scale training-data pipeline: files
  * of length-prefixed records (warcinfo / request / response / …),
  * response payloads carrying a full HTTP message whose body is the
  * page.
  *
  * Scale model: the FILE is the unit of parallelism, exactly as in
  * production crawls (Common Crawl ships ~1 GB .warc.gz segments; a
  * 100 TB crawl is ~10⁵ files → 10⁵ tasks, no shuffle at all on
  * ingest). `spark.read.format("binaryFile")` gives one row per file
  * and the record parser runs inside the executor; downstream
  * operators (language ID, quality, dedup) see an ordinary DataFrame.
  * The parser never SEARCHES for record boundaries — it jumps by the
  * mandatory Content-Length header, so a payload containing the bytes
  * "WARC/1.0" can never split a record (the classic naive-splitter
  * bug).
  *
  * Gzip: Common Crawl writes each record as its own gzip MEMBER and
  * concatenates them; `GZIPInputStream` walks concatenated members
  * natively, so both one-member-per-record and whole-file-gzip decode
  * through the same path. binaryFile has already materialized the
  * compressed bytes, so an in-memory inflate adds no asymptotic cost.
  *
  * Strictness: malformed input (bad magic, missing Content-Length,
  * truncated payload, non-CRLF header line) fails LOUDLY with the file
  * and byte offset — a crawl segment that parses wrong must never
  * silently contribute garbage documents.
  */
object Warc {

  /** One parsed WARC record. `httpStatus`/`contentType`/`body` are
    * populated for `response` records carrying an HTTP message
    * (Content-Type: application/http); for other record types `body`
    * is the raw payload and the HTTP fields stay null. */
  final case class WarcRecord(
      warcType: String, recordId: String, targetUri: String,
      warcDate: String, httpStatus: Option[Int],
      contentType: String, body: Array[Byte])

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_ix", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  /** Parse a (path, content) file frame — the shared core of the
    * batch [[records]] and the streaming ingest (StreamOps
    * .streamingWarcIngest feeds each micro-batch of newly-landed
    * segment files through here). */
  def recordsOf(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    val rows = files.select("path", "content").rdd.flatMap { r =>
      val file = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      parseAll(bytes, file).zipWithIndex.map { case (w, i) =>
        Row(file, i, w.warcType, w.recordId, w.targetUri, w.warcDate,
          w.httpStatus.map(Integer.valueOf).orNull, w.contentType,
          w.body)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Read every record of every WARC file under `path` (plain or
    * gzip — sniffed per file). One input file = one task; no shuffle. */
  def records(spark: SparkSession, path: String): DataFrame =
    recordsOf(spark.read.format("binaryFile").load(path))

  /** `response` records only, body decoded as UTF-8 text. */
  def responsesOf(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    records
      .filter(col("warc_type") === "response")
      .select(col("file"), col("record_ix"), col("target_uri"),
        col("warc_date"), col("http_status"), col("content_type"),
        decode(col("body"), "UTF-8").as("html"))
  }

  /** The documents-table view of a crawl: `response` records only,
    * body decoded as UTF-8 text. The projection every downstream
    * text operator starts from. */
  def responses(spark: SparkSession, path: String): DataFrame =
    responsesOf(records(spark, path))

  // ---------- parsing ----------

  /** Parse a whole WARC file (auto-inflating gzip). Strict: any
    * structural violation aborts with file + offset. */
  def parseAll(fileBytes: Array[Byte], file: String): Seq[WarcRecord] = {
    val b = inflateIfGzip(fileBytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = 0
    while ({ off = skipCrlf(b, off); off < b.length }) {
      val (version, afterMagic) = readLine(b, off, file)
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"$file: expected WARC/1.x magic at offset $off, got " +
          s"'${version.take(20)}'")
      var pos = afterMagic
      val headers = scala.collection.mutable.Map.empty[String, String]
      var line = ""
      while ({ val (l, p) = readLine(b, pos, file); line = l; pos = p
               line.nonEmpty }) {
        val ix = line.indexOf(':')
        require(ix > 0, s"$file: malformed WARC header '$line' near " +
          s"offset $pos")
        headers(line.substring(0, ix).trim.toLowerCase) =
          line.substring(ix + 1).trim
      }
      val len = headers.getOrElse("content-length", sys.error(
        s"$file: record at offset $off has no Content-Length")).toInt
      require(pos + len <= b.length,
        s"$file: truncated record at offset $off (payload $len bytes, " +
          s"${b.length - pos} remain)")
      val payload = java.util.Arrays.copyOfRange(b, pos, pos + len)
      off = pos + len
      val wtype = headers.getOrElse("warc-type", "unknown")
      val isHttp = headers.getOrElse("content-type", "")
        .startsWith("application/http")
      val rec =
        if (wtype == "response" && isHttp) {
          val (status, ctype, body) = parseHttpResponse(payload, file)
          WarcRecord(wtype, headers.getOrElse("warc-record-id", null),
            headers.getOrElse("warc-target-uri", null),
            headers.getOrElse("warc-date", null), Some(status), ctype,
            body)
        } else
          WarcRecord(wtype, headers.getOrElse("warc-record-id", null),
            headers.getOrElse("warc-target-uri", null),
            headers.getOrElse("warc-date", null), None,
            headers.getOrElse("content-type", null), payload)
      out += rec
    }
    out.toSeq
  }

  /** Split an HTTP response message into (status, media type, body).
    * The split is at the FIRST CRLFCRLF — a body containing its own
    * blank lines cannot confuse it. Media type is Content-Type up to
    * any ';charset=' parameter. */
  def parseHttpResponse(payload: Array[Byte], file: String):
      (Int, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(payload)
    require(sep >= 0, s"$file: HTTP response payload has no header/" +
      "body separator")
    val head = new String(payload, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n")
    val statusParts = lines.head.split(" ")
    require(statusParts.length >= 2 && statusParts.head.startsWith("HTTP/"),
      s"$file: malformed HTTP status line '${lines.head.take(40)}'")
    val status = statusParts(1).toInt
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(13).trim.split(";").head.trim
    }.orNull
    (status, ctype,
      java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  private def inflateIfGzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  private def skipCrlf(b: Array[Byte], start: Int): Int = {
    var i = start
    while (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
    i
  }

  /** Read one CRLF-terminated line; returns (line, offset past CRLF). */
  private def readLine(b: Array[Byte], start: Int, file: String):
      (String, Int) = {
    var i = start
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    require(i + 1 < b.length,
      s"$file: unterminated line at offset $start (WARC headers are " +
        "CRLF-delimited)")
    (new String(b, start, i - start, "UTF-8"), i + 2)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  // ---------- record / fixture synthesis ----------

  /** Serialize one WARC response record wrapping an HTML page as an
    * HTTP 200 message. Deterministic: record id is derived from the
    * URI, the date is the caller's. Content-Length counts BYTES (an
    * astral-plane page must not desynchronize the offset jump). */
  def responseRecord(uri: String, date: String, html: String):
      Array[Byte] = {
    val body = html.getBytes("UTF-8")
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    val payload = http ++ body
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:${uri.hashCode.toHexString}>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** A non-response record (warcinfo / request) — crawl files carry
    * these interleaved; readers must filter, not choke. */
  def auxRecord(warcType: String, uri: String, date: String,
                content: String): Array[Byte] = {
    val payload = content.getBytes("UTF-8")
    (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:graft:aux:${uri.hashCode.toHexString}>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** Gzip one record as its own member (the Common Crawl layout —
    * members concatenate into the .warc.gz file). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** Write a crawl-segment fixture dir: `pages` (id, html) become
    * response records at `http://graft.example/docs/<id>.html`,
    * chunked `recordsPerFile` per segment. Every segment leads with a
    * warcinfo and a request record (readers must filter, not choke);
    * even segments are per-record-member gzip (the Common Crawl
    * layout), odd segments plain — both decode paths stay exercised.
    * Driver-side bounded fixture write (the Multimodal.writePngDir
    * pattern — production data arrives AS .warc.gz, nothing at scale
    * ever synthesizes it). */
  def writeWarcDir(spark: SparkSession, pages: Seq[(Long, String)],
                   recordsPerFile: Int): String = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = graft.core.Tables.registerStagedDir(
      graft.core.Tables.tmpDir + "/warc_" +
        java.util.UUID.randomUUID().toString, conf)
    writeWarcInto(spark, dir, pages, recordsPerFile, segOffset = 0)
    dir
  }

  /** Write one WAVE of segments into an existing (or fresh) dir —
    * the streaming-ingest fixture shape, where later crawl waves land
    * next to earlier ones and `segOffset` keeps their names disjoint. */
  def writeWarcInto(spark: SparkSession, dir: String,
                    pages: Seq[(Long, String)], recordsPerFile: Int,
                    segOffset: Int): Unit = {
    require(pages.size <= 4096, s"fixture bound exceeded: ${pages.size}")
    val date = "2024-01-01T00:00:00Z"
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    pages.sortBy(_._1).grouped(recordsPerFile).zipWithIndex.foreach {
      case (chunk, segIx) =>
        val seg = segIx + segOffset
        val gz = seg % 2 == 0
        val aux = Seq(
          auxRecord("warcinfo", s"http://graft.example/seg/$seg", date,
            s"software: graft-fixture\r\nsegment: $seg\r\n"),
          auxRecord("request", s"http://graft.example/docs/ix.html",
            date, s"GET /docs/ix.html HTTP/1.1\r\n"))
        val recs = aux ++ chunk.map { case (id, html) =>
          responseRecord(s"http://graft.example/docs/$id.html", date,
            html)
        }
        val bytes =
          if (gz) recs.map(gzipMember).reduce(_ ++ _)
          else recs.reduce(_ ++ _)
        val name = if (gz) f"seg-$seg%05d.warc.gz"
                   else f"seg-$seg%05d.warc"
        val out = fs.create(new org.apache.hadoop.fs.Path(p, name), true)
        try out.write(bytes) finally out.close()
    }
  }
}
