package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (ISO 28500 / WARC 1.0) container handling — the ingestion
 * format of every CommonCrawl-derived training corpus. Two halves:
 *
 *  - a Catalyst BUILDER ([[responseFiles]]) that synthesizes valid
 *    WARC files from a text table entirely with string expressions
 *    (so an external SQL engine can replay the bytes and the driver's
 *    oracle can recompute every parsed field without a parser), and
 *  - a real byte-walking PARSER ([[parseResponses]]) that reads records
 *    the way a production WARC reader must: advance by the record's
 *    `Content-Length` octets, never by scanning for delimiters — a
 *    payload containing the literal `WARC/1.0` magic must not split a
 *    record (pinned by spec).
 *
 * The parser is per-partition imperative code (`mapPartitions` shape,
 * like the container walks in [[Multimodal]]): record iteration over a
 * byte stream is genuine sequential logic, and the parallelism unit of
 * a crawl corpus is the WARC FILE (CommonCrawl ships ~1 GiB files by
 * the thousands — one task per file scales to any corpus with no
 * shuffle at all; the parse is a narrow map).
 */
object Warc {

  /** One parsed WARC record. `http_status` is -1 and `target_uri` ""
    * for non-response records (warcinfo), keeping the schema
    * null-free so cross-engine compares stay trivial. */
  final case class WarcRecord(
      file_id: Long, rec_idx: Int, warc_type: String, target_uri: String,
      warc_date: String, content_length: Long, http_status: Int,
      body: String)

  private val Crlf = "\r\n"

  /**
   * Build one WARC file per group with Catalyst expressions only:
   * a `warcinfo` header record followed by one HTTP `response` record
   * per input row (status 200, text/plain body = the row's text).
   * `Content-Length` counts octets (`octet_length`), as the spec
   * requires, so multi-byte text round-trips. Returns
   * `(file_id, warc)` with `warc` a UTF-8 binary column.
   *
   * Scale shape: one `groupBy(file_id)` shuffle of the text rows, then
   * the whole file materializes in one in-row fold (`concat_ws` over
   * the sorted record array) — files are the unit real crawls shard
   * by, so the group IS the natural partition.
   */
  def responseFiles(df: DataFrame, fileIdCol: Column, idCol: Column,
      textCol: Column, uri: Column = null): DataFrame = {
    val uriC = Option(uri).getOrElse(
      concat(lit("https://example.com/doc/"), idCol.cast("string")))
    val http = concat(
      lit("HTTP/1.1 200 OK" + Crlf + "Content-Type: text/plain" + Crlf +
        "Content-Length: "), octet_length(textCol).cast("string"),
      lit(Crlf + Crlf), textCol)
    val rec = concat(
      lit("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
        "WARC-Target-URI: "), uriC,
      lit(Crlf + "WARC-Date: 2024-01-01T00:00:00Z" + Crlf +
        "Content-Type: application/http; msgtype=response" + Crlf +
        "Content-Length: "), octet_length(http).cast("string"),
      lit(Crlf + Crlf), http, lit(Crlf + Crlf))
    val info = "software: graft" + Crlf
    val infoRec = "WARC/1.0" + Crlf + "WARC-Type: warcinfo" + Crlf +
      "WARC-Date: 2024-01-01T00:00:00Z" + Crlf +
      "Content-Type: application/warc-fields" + Crlf +
      "Content-Length: " + info.getBytes("UTF-8").length + Crlf + Crlf +
      info + Crlf + Crlf
    df.select(fileIdCol.as("file_id"), idCol.cast("long").as("__id"),
        rec.as("__rec"))
      .groupBy("file_id")
      .agg(concat(lit(infoRec),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("__id"), col("__rec")))),
          r => r.getField("__rec")))).cast("binary").as("warc"))
  }

  /** Parse `(file_id, warc-bytes)` rows into records. Strict walk:
    * magic, header block, `Content-Length` octets of payload, record
    * separator — malformed input fails loudly rather than resyncing
    * (a production reader resyncs by scanning for the next magic at a
    * record boundary; silent resync inside a record hides corruption). */
  def parseResponses(files: DataFrame, fileIdCol: Column, warcCol: Column)(
      implicit spark: SparkSession): Dataset[WarcRecord] = {
    import spark.implicits._
    files.select(fileIdCol.cast("long"), warcCol)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (fid, bytes) => parseFile(fid, bytes) })
  }

  private[analytics] def parseFile(fileId: Long, b: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var idx = 0
    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      require(i + 1 < b.length, s"unterminated header line at $from")
      // WARC 1.0 named fields are UTF-8 (ISO 28500 §4); scanning for
      // CRLF on raw bytes stays correct because 0x0D/0x0A never occur
      // inside a UTF-8 multi-byte sequence.
      (new String(b, from, i - from, "UTF-8"), i + 2)
    }
    while (pos < b.length) {
      val (magic, p1) = line(pos)
      require(magic == "WARC/1.0", s"bad WARC magic at $pos: '$magic'")
      var p = p1
      val headers = scala.collection.mutable.Map.empty[String, String]
      var done = false
      while (!done) {
        val (l, np) = line(p); p = np
        if (l.isEmpty) done = true
        else {
          val c = l.indexOf(':')
          require(c > 0, s"malformed WARC header '$l'")
          headers(l.substring(0, c).trim.toLowerCase) = l.substring(c + 1).trim
        }
      }
      val cl = headers("content-length").toLong
      val wtype = headers("warc-type")
      val payload = java.util.Arrays.copyOfRange(b, p, p + cl.toInt)
      p += cl.toInt
      require(p + 4 <= b.length && b(p) == '\r' && b(p + 1) == '\n' &&
        b(p + 2) == '\r' && b(p + 3) == '\n',
        s"missing record separator at $p")
      p += 4
      if (wtype == "response") {
        val (status, body) = parseHttp(payload)
        out += WarcRecord(fileId, idx, wtype,
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""), cl, status, body)
      } else {
        out += WarcRecord(fileId, idx, wtype, "",
          headers.getOrElse("warc-date", ""), cl, -1, "")
      }
      idx += 1
      pos = p
    }
    out.toSeq
  }

  private def parseHttp(p: Array[Byte]): (Int, String) = {
    var i = 0
    def line(from: Int): (String, Int) = {
      var j = from
      while (j + 1 < p.length && !(p(j) == '\r' && p(j + 1) == '\n')) j += 1
      (new String(p, from, j - from, "ISO-8859-1"), math.min(j + 2, p.length))
    }
    val (status, p1) = line(0)
    // HTTP/1.0 responses are common in real crawl archives
    require(status.startsWith("HTTP/1.0 ") || status.startsWith("HTTP/1.1 "),
      s"bad HTTP status line '$status'")
    val code = status.substring(9, 12).toInt
    i = p1
    var done = false
    var contentLength = -1L
    while (!done) {
      val (l, np) = line(i); i = np
      if (l.isEmpty) done = true
      else if (l.toLowerCase.startsWith("content-length:"))
        contentLength = l.substring(15).trim.toLong
    }
    val body = new String(p, i, p.length - i, "UTF-8")
    require(contentLength < 0 || contentLength == p.length - i,
      s"HTTP Content-Length $contentLength != body octets ${p.length - i}")
    (code, body)
  }
}
