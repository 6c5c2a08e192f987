package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("WARC build + parse round-trips, advancing by Content-Length octets") {
    // doc 1's body CONTAINS the record magic + separator: a parser that
    // scans for delimiters instead of advancing by Content-Length would
    // split the record here. doc 2 carries multi-byte UTF-8 so an
    // octet/char confusion breaks the walk.
    val docs = Seq(
      (0L, "plain body"),
      (1L, "evil body with\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n embedded"),
      (2L, "accented résumé café über body"))
      .toDF("doc_id", "text")
    val files = Warc.responseFiles(docs, lit(7L), col("doc_id"), col("text"))
    assert(files.count() === 1L)
    val recs = Warc.parseResponses(files, col("file_id"), col("warc"))(spark)
      .collect().sortBy(_.rec_idx)
    assert(recs.length === 4)
    assert(recs(0).warc_type === "warcinfo")
    assert(recs(0).http_status === -1)
    val bodies = docs.as[(Long, String)].collect().toMap
    (1 to 3).foreach { i =>
      val r = recs(i)
      assert(r.warc_type === "response")
      assert(r.http_status === 200)
      val id = r.target_uri.split('/').last.toLong
      assert(r.body === bodies(id)) // byte-exact round-trip, incl. doc 1
      assert(r.file_id === 7L)
    }
    // WARC content_length counts octets of the full HTTP block
    val r2 = recs.find(_.target_uri.endsWith("/2")).get
    val http2 = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nContent-Length: " +
      bodies(2L).getBytes("UTF-8").length + "\r\n\r\n" + bodies(2L)
    assert(r2.content_length === http2.getBytes("UTF-8").length.toLong)
  }

  test("non-ASCII target URIs round-trip (UTF-8 headers) and HTTP/1.0 parses") {
    val docs = Seq((0L, "body text here")).toDF("doc_id", "text")
    val files = Warc.responseFiles(docs, lit(1L), col("doc_id"), col("text"),
      uri = lit("https://exämple.test/café/0"))
    val rec = Warc.parseResponses(files, col("file_id"), col("warc"))(spark)
      .collect().find(_.warc_type === "response").get
    assert(rec.target_uri === "https://exämple.test/café/0")
    // HTTP/1.0 status lines (common in real crawl archives) parse too
    val http10 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.test/1\r\nContent-Length: 45\r\n\r\n" +
      "HTTP/1.0 301 Moved\r\nContent-Length: 4\r\n\r\nbody" +
      "\r\n\r\n").getBytes("UTF-8")
    val r10 = Warc.parseFile(9L, http10)
    assert(r10.head.http_status === 301 && r10.head.body === "body")
  }

  test("malformed WARC input fails loudly instead of resyncing") {
    val bad = "NOTWARC/9.9\r\nWARC-Type: response\r\n\r\n".getBytes("UTF-8")
    val ex = intercept[Exception](Warc.parseFile(0L, bad))
    assert(ex.getMessage.contains("bad WARC magic"))
    // truncated payload: Content-Length larger than what remains
    val trunc = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 999\r\n\r\n" +
      "short").getBytes("UTF-8")
    intercept[Exception](Warc.parseFile(0L, trunc))
  }
}
